"""Phase isolation for the mega kernel on the bench problem: run
mega_factorize with (a) full tables, (b) Schur updates zeroed,
(c) panels+updates zeroed (diag chains only), (d) chains only with
nup/nl/nu AND bl=1 (launch floor).  Differences isolate per-phase cost
directly on the REAL kernel (microbenchmarks of synthetic scan loops
disagreed with per-level arithmetic — measure the thing itself).

Run ON CHIP: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_mega_phases.py [nx] [ordering]
"""

import sys
import time

import jax.numpy as jnp
import numpy as np

from pangulu_tpu.blocks import tile_matrix
from pangulu_tpu.models import poisson3d
from pangulu_tpu.ops.kernels_pallas import mega_factorize
from pangulu_tpu.reorder import reorder
from pangulu_tpu.schedule import build_schedule
from pangulu_tpu.symbolic import symbolic
from pangulu_tpu.utils import device_sync, enable_compilation_cache


def probe():
    import jax

    x = jax.random.normal(jax.random.PRNGKey(0), (2048, 2048))
    device_sync(x @ x)
    t0 = time.perf_counter()
    y = x
    for _ in range(10):
        y = y @ y * 1e-3
    device_sync(y)
    dt = time.perf_counter() - t0
    return 10 * 2 * 2048 ** 3 / dt / 1e12


def main():
    enable_compilation_cache()
    tf = probe()
    print(f"probe: {tf:.2f} TF sustained matmul")
    if tf < 4.0:
        print("CHIP DEGRADED — numbers below are not meaningful")
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ordering = sys.argv[2] if len(sys.argv) > 2 else "rcm"
    a = poisson3d(nx)
    nb = 128
    ro = reorder(a, ordering=ordering, nb=nb)
    symb = symbolic(ro.reordered, nb)
    blocked = tile_matrix(ro.reordered, symb)
    sched = build_schedule(blocked)
    t = {k: (v if isinstance(v, int) else v)
         for k, v in sched.mega_tables(blocked.num_tiles).items()}
    bl = sched.block_length
    print(f"n={a.n} bl={bl} tiles={blocked.num_tiles} "
          f"ssssm={sched.n_ssssm} tstrf+gessm={sched.n_tstrf+sched.n_gessm}")

    variants = {
        "full": t,
        "no_schur": {**t, "nup_tab": np.zeros_like(t["nup_tab"])},
        "chains_only": {**t, "nup_tab": np.zeros_like(t["nup_tab"]),
                        "nl_tab": np.zeros_like(t["nl_tab"]),
                        "nu_tab": np.zeros_like(t["nu_tab"])},
    }
    base = None
    for name, tv in variants.items():
        tiles = jnp.asarray(blocked.tiles)
        args = {k: (v if isinstance(v, int) else jnp.asarray(v))
                for k, v in tv.items()}
        def run(tt):
            return mega_factorize(
                tt, args["diag_tab"], args["nl_tab"], args["nu_tab"],
                args["nup_tab"], args["lid_tab"], args["uid_tab"],
                args["udst_tab"], args["udl_tab"], args["udu_tab"],
                nb=nb, tol=1e-8, bl=bl, pch=args["pch"])

        out, invs = run(tiles)
        out = device_sync(out)
        # chained reps on the donated output (identical op stream; no
        # H2D in the timed window — bench.py methodology)
        K = 10
        t0 = time.perf_counter()
        for _ in range(K):
            out, invs = run(out)
        device_sync(out)
        dt = (time.perf_counter() - t0) / K
        if base is None:
            base = dt
        print(f"{name:12s}: {dt*1e3:8.2f} ms  ({dt/bl*1e6:6.1f} us/level)")


if __name__ == "__main__":
    main()
