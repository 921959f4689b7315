#!/usr/bin/env python
"""Round-3 on-chip evidence runs (ROADMAP items 8):

1. dd (double-float r64) FACTORIZATION at n >= 32k on the chip —
   demonstrates R64-class accuracy at scale on f32 hardware (the
   reference treats R64 as the default value type,
   /root/reference/src/pangulu_common.h:11-33).
2. cr64 soak: repeated update_values + gstrf + gstrs cycles on a
   complex double matrix (complex-embed -> dd engine).

Run ON THE CHIP:
    PYTHONPATH=/root/.axon_site:/root/repo python tools/run_r3_extras.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from pangulu_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    from pangulu_tpu.api import (InitOptions, finalize, gstrf, gstrs,
                                 init, update_values)
    from pangulu_tpu.models import poisson3d, random_unsymmetric
    from pangulu_tpu.utils.perf import residual_norm

    # --- 1. dd factorization at n = 32768 ------------------------------
    nx = int(os.environ.get("DD_NX", "32"))
    a = poisson3d(nx)
    t0 = time.perf_counter()
    h = init(a, InitOptions(nb=128, dtype="r64", ordering="rcm",
                            symbolic_mode="block"))
    t_init = time.perf_counter() - t0
    t0 = time.perf_counter()
    gstrf(h)
    t_f = time.perf_counter() - t0
    disp = h._factorizer.dispatch if h._factorizer else "?"
    b = np.asarray(a.to_scipy() @ np.ones(a.n), dtype=np.float64)
    t0 = time.perf_counter()
    x = gstrs(h, b)
    t_s = time.perf_counter() - t0
    res = residual_norm(a.to_scipy(), x, b)
    ok = res < 1e-10 and disp in ("dd", "dd_group", "dd_mega")
    print(f"dd r64 n={a.n} dispatch={disp} init {t_init:.1f}s "
          f"gstrf {t_f:.1f}s (incl compile) gstrs {t_s:.1f}s "
          f"residual {res:.3e} {'OK' if ok else 'FAIL'}", flush=True)
    # steady-state factorization rate: K runs + one sync, each run
    # factoring the ORIGINAL matrix values.  The dd engines donate
    # their tile inputs, so keep a pristine hi/lo pair on device and
    # feed a device-side copy each iteration (the copy is a cheap
    # async device op, no round trip; refeeding factored output would
    # time meaningless/overflowing inputs).
    import jax.numpy as jnp

    from pangulu_tpu.numeric import DdTiles
    from pangulu_tpu.utils import device_sync

    fac = h._factorizer
    host = h.blocked.tiles
    hi = np.asarray(host, dtype=np.float32)
    lo = (np.asarray(host, dtype=np.float64)
          - hi.astype(np.float64)).astype(np.float32)
    th0 = device_sync(jnp.asarray(hi))
    tl0 = device_sync(jnp.asarray(lo))
    tiles = fac.factorize(DdTiles(th0 + 0, tl0 + 0), sync=False)
    device_sync(tiles.hi)          # warm
    k = 5
    t0 = time.perf_counter()
    for _ in range(k):
        tiles = fac.factorize(DdTiles(th0 + 0, tl0 + 0), sync=False)
    device_sync(tiles.hi)
    dt = (time.perf_counter() - t0) / k
    gf = h.schedule.flop_estimate() / dt / 1e9
    print(f"dd r64 n={a.n} steady: {dt*1e3:.1f} ms/fact = {gf:.0f} "
          f"GFLOPS (dense model; every flop f32-pair)", flush=True)
    finalize(h)

    # --- 2. cr64 soak ---------------------------------------------------
    cycles = int(os.environ.get("CR64_CYCLES", "8"))
    rng = np.random.default_rng(11)
    ac = random_unsymmetric(1200, 3e-3, seed=5, dtype=np.complex128)
    sp = ac.to_scipy().tocsc()
    h = init(ac, InitOptions(nb=128, dtype="cr64"))
    worst = 0.0
    for c in range(cycles):
        if c:
            vals = sp.data * (1.0 + 0.01 * rng.standard_normal(sp.nnz)
                              + 0.01j * rng.standard_normal(sp.nnz))
            sp2 = sp.copy()
            sp2.data = vals
            update_values(h, sp2)
        else:
            sp2 = sp
        gstrf(h)
        xref = rng.standard_normal(ac.n) + 1j * rng.standard_normal(ac.n)
        b = sp2 @ xref
        x = gstrs(h, b)
        res = residual_norm(sp2, x, b)
        worst = max(worst, res)
        print(f"cr64 soak cycle {c}: residual {res:.3e}", flush=True)
    disp = h._factorizer.dispatch if h._factorizer else "?"
    soak_ok = worst < 1e-10
    print(f"cr64 soak n={ac.n} cycles={cycles} dispatch={disp} worst "
          f"residual {worst:.3e} {'OK' if soak_ok else 'FAIL'}",
          flush=True)
    finalize(h)
    # exit nonzero when either gate fails so automation can detect it
    return 0 if (ok and soak_ok) else 1


if __name__ == "__main__":
    sys.exit(main())
