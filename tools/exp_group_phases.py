#!/usr/bin/env python
"""Phase isolation for the BATCHED-GROUP mega kernel on the bench
problem: run mega_factorize_groups with (a) full tables, (b) Schur
updates zeroed, (c) panels+updates zeroed (batched diag only), and
(d) ng=1 (launch floor).  Differences isolate per-phase cost on the
REAL kernel.  Compare with tools/exp_mega_phases.py (chain kernel).

Run ON CHIP:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_group_phases.py [nx] [ordering] [gmax]
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

    from pangulu_tpu.blocks import tile_matrix
    from pangulu_tpu.models import poisson3d
    from pangulu_tpu.ops.kernels_pallas import mega_factorize_groups
    from pangulu_tpu.reorder import reorder
    from pangulu_tpu.symbolic import symbolic

    x = jax.random.normal(jax.random.PRNGKey(0), (2048, 2048))
    device_sync(x @ x)
    t0 = time.perf_counter()
    y = x
    for _ in range(10):
        y = y @ y * 1e-3
    device_sync(y)
    tf = 10 * 2 * 2048 ** 3 / (time.perf_counter() - t0) / 1e12
    print(f"probe: {tf:.2f} TF sustained matmul")

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ordering = sys.argv[2] if len(sys.argv) > 2 else "nd"
    gmax = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    nb = 128
    a = poisson3d(nx)
    ro = reorder(a, ordering=ordering, nb=nb)
    symb = symbolic(ro.reordered, nb, mode="block")
    blocked = tile_matrix(ro.reordered, symb)
    from pangulu_tpu.schedule import build_schedule
    sch = build_schedule(blocked)
    t = sch.group_mega_tables(blocked.num_tiles, gmax=gmax)
    print(f"bl={sch.block_length} ngroups={t['ngroups']} gmax={gmax} "
          f"pch={t['pch']} npan_l={t['npan_l']}")

    def tiles0():
        return blocked.device_tiles()

    def run(tag, tabs, reps=8):
        kw = dict(nb=nb, tol=1e-8, ng=tabs["ngroups"], gmax=tabs["gmax"],
                  pch=tabs["pch"], uch=tabs["uch"], bl=sch.block_length)
        args = [jnp.asarray(tabs[k]) for k in
                ("gs_tab", "nup_tab", "gdiag_tab", "glev_tab",
                 "gloff_tab", "guoff_tab", "lid_tab", "uid_tab",
                 "udst_tab", "udl_tab", "udu_tab")]
        tiles = tiles0()
        tiles, invs = mega_factorize_groups(tiles, *args, **kw)
        device_sync(tiles)
        t0 = time.perf_counter()
        for _ in range(reps):
            tiles, invs = mega_factorize_groups(tiles, *args, **kw)
        device_sync(tiles)
        dt = (time.perf_counter() - t0) / reps
        print(f"{tag:28s} {dt*1e3:8.2f} ms")
        return dt

    full = dict(t)
    run("full", full)

    noupd = dict(t)
    noupd["nup_tab"] = np.zeros_like(t["nup_tab"])
    run("no Schur updates", noupd)

    diag_only = dict(noupd)
    diag_only["gloff_tab"] = np.zeros_like(t["gloff_tab"])
    diag_only["guoff_tab"] = np.zeros_like(t["guoff_tab"])
    run("diag only (no panels)", diag_only)

    floor = dict(diag_only)
    floor["ngroups"] = 1
    run("launch floor (ng=1)", floor)


if __name__ == "__main__":
    main()
