#!/usr/bin/env python
"""A/B the MXU-blocked diag LU (inv='blocked*') against the rank-1
scan inside the REAL mega kernel on the bench problem (VERDICT r3 #2:
break the 36 us/level serial diag floor).

Per mode: K chained mega factorizations + one sync (the repo's
standard steady-state timing), plus the PANGULU_MEGA_INV=skip /
scanonly debug decomposition re-measured for the winning mode.

Run ON CHIP:
    PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_blocked_scan.py [nx] [ordering] [nb]
"""

import sys
import time

import numpy as np

from pangulu_tpu.utils import device_sync, enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from pangulu_tpu.blocks import tile_matrix  # noqa: E402
from pangulu_tpu.models import poisson3d  # noqa: E402
from pangulu_tpu.ops.kernels_pallas import mega_factorize, mega_uch  # noqa: E402
from pangulu_tpu.reorder import reorder  # noqa: E402
from pangulu_tpu.schedule import build_schedule  # noqa: E402
from pangulu_tpu.symbolic import symbolic  # noqa: E402


def probe():
    import jax

    x = jax.random.normal(jax.random.PRNGKey(0), (2048, 2048))
    device_sync(x @ x)
    t0 = time.perf_counter()
    y = x
    for _ in range(10):
        y = y @ y * 1e-3
    device_sync(y)
    return 10 * 2 * 2048 ** 3 / (time.perf_counter() - t0) / 1e12


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ordering = sys.argv[2] if len(sys.argv) > 2 else "rcm"
    nb = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    print(f"probe: {probe():.2f} TF")
    a = poisson3d(nx)
    ro = reorder(a, ordering=ordering, nb=nb)
    symb = symbolic(ro.reordered, nb, mode="block")
    blocked = tile_matrix(ro.reordered, symb)
    sched = build_schedule(blocked)
    bl = sched.block_length
    t = sched.mega_tables(blocked.num_tiles, uch=mega_uch(nb))
    args = {k: (v if isinstance(v, int) else jnp.asarray(v))
            for k, v in t.items()}
    flops = sched.flop_estimate()
    print(f"n={a.n} nb={nb} bl={bl} tiles={blocked.num_tiles} "
          f"ssssm={sched.n_ssssm}")

    def run(tiles, inv):
        return mega_factorize(
            tiles, args["diag_tab"], args["nl_tab"], args["nu_tab"],
            args["nup_tab"], args["lid_tab"], args["uid_tab"],
            args["udst_tab"], args["udl_tab"], args["udu_tab"],
            nb=nb, tol=1e-8, bl=bl, pch=args["pch"], uch=args["uch"],
            inv=inv)

    import os

    modes = (os.environ.get("MODES").split(",")
             if os.environ.get("MODES") else
             ["newton", "blocked8", "blocked16", "blocked32",
              "sliced4", "sliced8", "sliced16", "skip", "scanonly"])
    results = {}
    for inv in modes:
        tiles = jnp.asarray(blocked.tiles)
        out, invs = run(tiles, inv)
        out = device_sync(out)
        K = 12
        t0 = time.perf_counter()
        for _ in range(K):
            out, invs = run(out, inv)
        device_sync(out)
        dt = (time.perf_counter() - t0) / K
        results[inv] = dt
        gf = flops / dt / 1e9
        print(f"inv={inv:10s} {dt * 1e3:7.2f} ms/fact  {gf:7.0f} GF "
              f"({dt / bl * 1e6:5.1f} us/level)", flush=True)
    timed = [m for m in modes if m not in ("skip", "scanonly")]
    best = min(timed, key=lambda m: results[m])
    base = results.get("newton")
    if base is not None:
        print(f"best mode: {best} ({results[best] * 1e3:.2f} ms vs "
              f"newton {base * 1e3:.2f} ms, "
              f"{(base - results[best]) / bl * 1e6:+.1f} us/level)")


if __name__ == "__main__":
    main()
