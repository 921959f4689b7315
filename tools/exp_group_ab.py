#!/usr/bin/env python
"""On-chip A/B: rcm+mega (chain) vs nd+mega_group (batched groups).

Decides the shipping bench config (ROADMAP #1 / judge r2 item #1
"done when": nd+mega beats rcm+mega on poisson3d(32)).  Timing is
K chained runs + ONE sync (26 ms tunnel readback otherwise dominates).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from pangulu_tpu.utils import device_sync, enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pangulu_tpu.api import InitOptions, init
    from pangulu_tpu.blocks import gather_factor
    from pangulu_tpu.models import poisson3d
    from pangulu_tpu.numeric import LUFactorizer
    from pangulu_tpu.ops.interface import get_backend
    from pangulu_tpu.utils.perf import factorization_residual

    nx = int(os.environ.get("AB_NX", "32"))
    nb = int(os.environ.get("AB_NB", "128"))
    reps = int(os.environ.get("AB_REPS", "10"))
    a = poisson3d(nx)

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
        return 2 * 2048**3 / ((time.perf_counter() - t0) / k) / 1e12

    def measure(ordering, dispatch="auto"):
        opts = InitOptions(nb=nb, dtype="r32", ordering=ordering,
                           symbolic_mode="block")
        handle = init(a, opts)
        backend = get_backend("auto", nb=nb, dtype=handle.blocked.dtype)
        fac = LUFactorizer(handle.blocked, handle.schedule,
                           backend=backend, dispatch=dispatch)
        tiles = fac.factorize()
        lmat, umat = gather_factor(handle.blocked, np.asarray(tiles))
        res = factorization_residual(
            handle.reordering.reordered.to_scipy(), lmat, umat)
        tiles = device_sync(fac.factorize(tiles, sync=False))
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                tiles = fac.factorize(tiles, sync=False)
            device_sync(tiles)
            dt = min(dt, (time.perf_counter() - t0) / reps)
        gf = handle.schedule.flop_estimate() / dt / 1e9
        print(f"{ordering:>4s}/{fac.dispatch:<11s} {dt*1e3:7.2f} ms  "
              f"{gf:7.0f} GF(dense-model)  residual {res:.2e}  "
              f"levels={handle.schedule.block_length}", flush=True)
        return dt, res

    tf = probe_tf()
    print(f"probe: {tf:.2f} TF matmul", flush=True)
    configs = os.environ.get(
        "AB_CONFIGS", "rcm:auto,nd:auto,nd:mega").split(",")
    for c in configs:
        ordering, dispatch = c.split(":")
        measure(ordering, dispatch)
    print(f"probe after: {probe_tf():.2f} TF", flush=True)


if __name__ == "__main__":
    main()
