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
    from pangulu_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from pangulu_tpu.api import InitOptions, gstrf, init
    from pangulu_tpu.models import poisson3d

    nx = int(os.environ.get("PANGULU_BENCH_NX", "32"))
    nb = int(os.environ.get("PANGULU_BENCH_NB", "128"))
    reps = int(os.environ.get("PANGULU_BENCH_REPS", "3"))
    a = poisson3d(nx)

    opts = InitOptions(nb=nb, dtype="r32", ordering="rcm",
                       symbolic_mode="block")
    handle = init(a, opts)

    # Warm-up run compiles (persistently cached across runs); timed
    # runs measure steady-state throughput.  Completion is enforced by
    # a device readback inside the engine (block_until_ready is a
    # no-op on tunneled backends).
    gstrf(handle)
    best = 0.0
    for _ in range(reps):
        handle.perf.phase_time.pop("numeric", None)
        handle.perf.flops = 0.0
        gstrf(handle)
        best = max(best, handle.perf.gflops("numeric"))

    gflops = best
    result = {
        "metric": "numeric_factorization_gflops",
        "value": round(gflops, 3),
        "unit": "GFLOPS",
        "vs_baseline": round(gflops / BASELINE_GFLOPS, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
