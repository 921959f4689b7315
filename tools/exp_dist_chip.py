#!/usr/bin/env python
"""On-chip measurement of the COLLECTIVE engine (judge r4 item 3).

Runs the distributed shard_map engine on a (1,1) mesh with
force_collective=True on the bench matrix and times it with the
steady-state protocol (K chained factorize(sync=False) + ONE final
sync), next to the single-chip mega kernel on the same matrix.  On a
1x1 mesh the collectives are degenerate, so the delta is pure engine
overhead: XLA group-loop op dispatch + padding vs the Pallas
single-launch kernel — the multi-chip per-device compute cost.

Usage (on the TPU):  PYTHONPATH=... python tools/exp_dist_chip.py
Env: NX (default 32), NB (128), REPS (10), ORDERING (rcm|nd, default
both).
"""

import os
import sys
import time

import numpy as np


def main():
    from pangulu_tpu.utils import device_sync, enable_compilation_cache

    enable_compilation_cache()
    import jax

    from pangulu_tpu.api import InitOptions, init
    from pangulu_tpu.blocks import gather_factor
    from pangulu_tpu.models import poisson3d
    from pangulu_tpu.numeric import LUFactorizer
    from pangulu_tpu.ops.interface import get_backend
    from pangulu_tpu.parallel.dist_numeric import DistributedLU
    from pangulu_tpu.parallel.mesh import make_mesh
    from pangulu_tpu.utils.perf import factorization_residual

    nx = int(os.environ.get("NX", "32"))
    nb = int(os.environ.get("NB", "128"))
    reps = int(os.environ.get("REPS", "10"))
    pinned = os.environ.get("ORDERING")
    orderings = [pinned] if pinned else ["rcm", "nd"]

    a = poisson3d(nx)
    print(f"n={a.n} nnz={a.nnz} nb={nb} backend={jax.default_backend()}",
          file=sys.stderr)

    for ordering in orderings:
        h = init(a, InitOptions(nb=nb, dtype="r32", ordering=ordering,
                                symbolic_mode="block"))
        backend = get_backend("auto", nb=nb, dtype=h.blocked.dtype)

        # --- single-chip mega reference --------------------------------
        fac = LUFactorizer(h.blocked, h.schedule, backend=backend)
        tiles = fac.factorize()
        lm, um = gather_factor(h.blocked, np.asarray(tiles))
        res = factorization_residual(
            h.reordering.reordered.to_scipy(), lm, um)
        tiles = device_sync(fac.factorize(tiles, sync=False))
        dt_mega = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(max(reps, 1)):
                tiles = fac.factorize(tiles, sync=False)
            device_sync(tiles)
            dt_mega = min(dt_mega,
                          (time.perf_counter() - t0) / max(reps, 1))
        print(f"{ordering}: mega {fac.dispatch} {dt_mega*1e3:.2f} "
              f"ms/fact (residual {res:.2e})", file=sys.stderr)

        # --- collective engine, (1,1) mesh ------------------------------
        mesh = make_mesh(1)
        dist = DistributedLU(h.blocked, h.schedule, (1, 1), mesh=mesh,
                             backend=backend, force_collective=True)
        assert dist.single is None
        g = dist.factorize()  # correctness (synced, gathered)
        lm, um = gather_factor(h.blocked, np.asarray(g))
        res_d = factorization_residual(
            h.reordering.reordered.to_scipy(), lm, um)
        dtiles = device_sync(dist.factorize(sync=False))
        dt_dist = float("inf")
        k = max(reps // 2, 1)
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(k):
                dtiles = dist.factorize(dtiles, sync=False)
            device_sync(dtiles)
            dt_dist = min(dt_dist, (time.perf_counter() - t0) / k)
        segs = len(dist._segments)
        ngroups = sum(km.shape[0] for km, _, _, _ in dist._segments)
        print(f"{ordering}: collective(1,1) {dt_dist*1e3:.2f} ms/fact "
              f"(residual {res_d:.2e}, {segs} segments, {ngroups} "
              f"groups) = {dt_dist/dt_mega:.1f}x mega", file=sys.stderr)
        gf = h.schedule.flop_estimate() / dt_dist / 1e9
        print(f"RESULT {ordering}: mega={dt_mega*1e3:.2f}ms "
              f"dist={dt_dist*1e3:.2f}ms ratio={dt_dist/dt_mega:.2f} "
              f"dist_gflops={gf:.0f}")


if __name__ == "__main__":
    main()
