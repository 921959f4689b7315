#!/usr/bin/env python
"""Benchmark driver: numeric-factorization GFLOPS on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: numeric-phase GFLOPS (dense-tile flop model / wall time) on a
3D Poisson model problem — the same headline metric the reference
prints under -DPANGULU_PERF (pangulu_strings.h:84).  The reference
repo publishes no numbers (BASELINE.md); the baseline constant below
is this repo's own measured single-core CPU-backend throughput for the
identical problem, so vs_baseline tracks TPU speedup over the CPU
execution of the same algorithm.

Timing methodology: on this environment's tunneled TPU, ANY host
readback costs a ~26 ms round trip regardless of size (measured;
block_until_ready is a no-op).  Steady-state throughput is therefore
measured over K chained factorizations with ONE final sync — the
factorization's op stream is data-independent, so chaining the engine
on its own (donated) output executes identical work per rep.
Correctness is checked separately on a synced run.
"""

import json
import os
import sys
import time

# Measured on this environment's 1-core CPU backend (jax 0.9, f32,
# poisson3d(32), nb=128, fused engine + Newton inverses) — see
# BASELINE.md "measured" table.  The reference repo publishes no
# numbers; this anchors vs_baseline to the identical algorithm on the
# host CPU.
BASELINE_GFLOPS = 31.0


def main():
    from pangulu_tpu.utils import device_sync, enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    from pangulu_tpu.api import InitOptions, init
    from pangulu_tpu.blocks import gather_factor
    from pangulu_tpu.numeric import LUFactorizer
    from pangulu_tpu.ops.interface import get_backend
    from pangulu_tpu.utils.perf import factorization_residual

    nx = int(os.environ.get("PANGULU_BENCH_NX", "32"))
    nb = int(os.environ.get("PANGULU_BENCH_NB", "128"))
    reps = int(os.environ.get("PANGULU_BENCH_REPS", "20"))
    from pangulu_tpu.models import poisson3d

    a = poisson3d(nx)

    # Candidate configs: rcm rides the per-level chain mega kernel; an
    # nb-ALIGNED nested dissection compresses the schedule into
    # super-level groups for the batched-group mega kernel (256 -> ~25
    # sequential steps on this problem).  The winner is picked by
    # MEASURED wall time below; pin with PANGULU_BENCH_ORDERING.
    pinned = os.environ.get("PANGULU_BENCH_ORDERING")
    orderings = [pinned] if pinned else ["rcm", "nd"]
    candidates = []
    for ordering in orderings:
        opts = InitOptions(nb=nb, dtype="r32", ordering=ordering,
                           symbolic_mode="block")
        h = init(a, opts)
        backend = get_backend("auto", nb=nb, dtype=h.blocked.dtype)
        candidates.append((ordering, h, LUFactorizer(
            h.blocked, h.schedule, backend=backend)))

    # Tunnel health gate: the sync round trip is normally ~26 ms; a
    # congested tunnel (observed: 17-60+ s readbacks, infrastructure-
    # side) invalidates wall-clock GFLOPS.  Instead of recording a
    # garbage number (round 1 recorded 2.5 TF during a 334 s
    # degradation; healthy band 3.1-3.4 TF), PROBE-AND-WAIT: retry the
    # probe for up to ~10 minutes until the link is healthy, and flag
    # the result if it never recovers.
    import jax.numpy as jnp

    def probe_rtt():
        t0 = time.perf_counter()
        device_sync(jnp.ones((8, 128)) + 0.0)
        return time.perf_counter() - t0

    # Compute-throughput probe: the shared chip can be THROUGHPUT-
    # degraded (preemption/interference) while the readback RTT looks
    # healthy (observed: identical code at 3.0 TF and 1.9 TF an hour
    # apart with 35 ms probes both times).  A chained 2048^3 matmul
    # window measures the actual sustained rate; healthy is ~5 TF f32
    # on this v5e.
    import jax

    @jax.jit
    def _mm(x):
        return x @ x

    def probe_tf(k=12):
        x = device_sync(jnp.ones((2048, 2048), jnp.float32) * 1e-3)
        x = device_sync(_mm(x))
        t0 = time.perf_counter()
        for _ in range(k):
            x = _mm(x)
        device_sync(x)
        dt = (time.perf_counter() - t0) / k
        return 2 * 2048**3 / dt / 1e12

    probe_rtt()  # warm the probe's compile/cache
    deadline = time.monotonic() + float(
        os.environ.get("PANGULU_BENCH_HEALTH_WAIT_S", "600"))
    min_tf = float(os.environ.get("PANGULU_BENCH_MIN_PROBE_TF", "4.0"))
    rtt = probe_rtt()
    tf = probe_tf()
    degraded = rtt > 1.0 or tf < min_tf
    while degraded and time.monotonic() < deadline:
        print(f"WARNING: chip health probe rtt={rtt:.2f}s "
              f"matmul={tf:.2f}TF (healthy: ~0.03s / >{min_tf}TF) — "
              f"waiting for the shared chip to recover",
              file=sys.stderr)
        time.sleep(20.0)
        rtt = probe_rtt()
        tf = probe_tf()
        degraded = rtt > 1.0 or tf < min_tf
    if degraded:
        print(f"WARNING: chip still degraded after the health wait "
              f"(rtt={rtt:.2f}s matmul={tf:.2f}TF); reported GFLOPS "
              f"will be unrepresentative", file=sys.stderr)

    # Per candidate: correctness gate (one synced run must produce a
    # valid factor), then steady state — K chained engine runs, one
    # final sync per window, three windows, best taken (the shared
    # tunneled chip shows transient slowdowns; measured band 2.0-3.4 TF
    # on identical code).  Winner = smallest wall time per
    # factorization of the SAME matrix.
    best = None
    for ordering, handle, fac in candidates:
        tiles = fac.factorize()
        lmat, umat = gather_factor(handle.blocked, np.asarray(tiles))
        res = factorization_residual(
            handle.reordering.reordered.to_scipy(), lmat, umat)
        if not res < 1e-3:
            print(json.dumps({"metric": "numeric_factorization_gflops",
                              "value": 0.0, "unit": "GFLOPS",
                              "vs_baseline": 0.0, "ordering": ordering,
                              "error": f"residual {res:.3e}"}))
            return
        tiles = device_sync(fac.factorize(tiles, sync=False))
        dt = float("inf")
        for _ in range(3):
            k = max(reps // 2, 1)
            t0 = time.perf_counter()
            for _ in range(k):
                tiles = fac.factorize(tiles, sync=False)
            device_sync(tiles)
            dt = min(dt, (time.perf_counter() - t0) / k)
        print(f"  {ordering}/{fac.dispatch}: {dt*1e3:.2f} ms/fact, "
              f"residual {res:.2e}", file=sys.stderr)
        if best is None or dt < best[3]:
            best = (ordering, handle, fac, dt)
    ordering, handle, fac, dt = best

    gflops = handle.schedule.flop_estimate() / dt / 1e9

    # Dual accounting (reference-comparable): exact sparse LU flops and
    # factor nnz from a scalar-mode symbolic pass on the same reordered
    # matrix (the tiles/schedule above use the cheaper block mode).
    from pangulu_tpu.symbolic import symbolic as _symbolic

    symb_exact = _symbolic(handle.reordering.reordered, nb, mode="scalar")
    useful_gflops = (symb_exact.sparse_flops() or 0.0) / dt / 1e9
    nnz_per_s = symb_exact.symbolic_nnz / dt

    result = {
        "metric": "numeric_factorization_gflops",
        "value": round(gflops, 3),
        "unit": "GFLOPS",
        "vs_baseline": round(gflops / BASELINE_GFLOPS, 3),
        "ordering": ordering,
        "engine": fac.dispatch,
        "ms_per_factorization": round(dt * 1e3, 3),
        # exact sparse-flop metrics, comparable with the reference's
        # -DPANGULU_PERF GFLOPS line and nnz/s scaling metric
        "useful_gflops": round(useful_gflops, 3),
        "factor_nnz": int(symb_exact.symbolic_nnz),
        "nnz_per_s": round(nnz_per_s, 1),
        # context: device-link round trip + matmul-probe throughput
        # during this run (healthy: ~0.03 s / ~5 TF; the health gate
        # above waits for recovery before timing)
        "tunnel_rtt_s": round(rtt, 3),
        "probe_matmul_tf": round(tf, 2),
        "tunnel_degraded": bool(degraded),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
