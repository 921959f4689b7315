"""Batched-group mega kernel (interpret mode on CPU; the on-chip sweep
covers the compiled path): G independent diag chains per kernel
iteration, one 3D batched rank-1 scan, slot-shared duplicate
destinations in the Schur stream."""

import jax.numpy as jnp
import numpy as np
import pytest

from pangulu_tpu.api import InitOptions, init
from pangulu_tpu.models import poisson2d, random_unsymmetric, smallworld
from pangulu_tpu.numeric import LUFactorizer
from pangulu_tpu.ops.interface import get_backend


def _decoupled():
    import scipy.sparse as sp

    from pangulu_tpu.sparse import CscMatrix

    a1 = poisson2d(8).to_scipy()
    a2 = random_unsymmetric(64, 0.08, seed=4).to_scipy()
    return CscMatrix.from_scipy(sp.csc_matrix(sp.block_diag([a1, a2])))


def _group_tables_have_shared_dsts(t):
    """True if some chunk carries a duplicate destination (slot-shared
    accumulation actually exercised)."""
    udl = np.asarray(t["udl_tab"])
    load = (udl >> 28) & 1
    nup = np.asarray(t["nup_tab"])
    uch = t["uch"]
    for g in range(t["ngroups"]):
        for c in range(udl.shape[1]):
            cnt = min(max(int(nup[g]) - c * uch, 0), uch)
            if cnt and int(load[g, c, :cnt].sum()) < cnt:
                return True
    return False


@pytest.mark.parametrize("gen,kw,ordering", [
    pytest.param(poisson2d, dict(nx=12), "nd",
                 marks=pytest.mark.slow),
    pytest.param(_decoupled, dict(), "natural",
                 marks=pytest.mark.slow),
    pytest.param(smallworld, dict(nx=14), "nd",
                 marks=pytest.mark.slow),
])
def test_group_matches_fused(gen, kw, ordering):
    from pangulu_tpu.sptrsv import TriangularSolver

    a = gen(**kw)
    h = init(a, InitOptions(nb=16, dtype="r32", ordering=ordering))
    bk = get_backend("pallas", nb=16, dtype=h.blocked.dtype)
    grp = LUFactorizer(h.blocked, h.schedule, backend=bk,
                       dispatch="mega_group")
    t = grp._mega
    assert t["ngroups"] < h.schedule.block_length, \
        "schedule has no super-level compression"
    t_grp = np.asarray(grp.factorize())
    fused = LUFactorizer(h.blocked, h.schedule,
                         backend=get_backend("jax"), dispatch="fused")
    t_fused = np.asarray(fused.factorize())
    nt = h.blocked.num_tiles
    np.testing.assert_allclose(t_grp[:nt], t_fused[:nt],
                               rtol=2e-4, atol=2e-4)
    # inverse store is indexed by ORIGINAL level: the solve kernels
    # work unchanged on it
    ts = TriangularSolver(h.blocked, h.schedule, backend=bk,
                          inv_tiles=grp.inv_tiles)
    b = (h.reordering.reordered.to_scipy()
         @ np.ones(a.n, np.float32)).astype(np.float32)
    x = ts._solve_mega(jnp.asarray(t_grp), b)
    x_ref = ts.solve(t_grp, b)
    np.testing.assert_allclose(x, x_ref, rtol=1e-4, atol=1e-4)


def test_group_shared_dst_slots_exercised():
    """Nested-dissection groups share Schur destinations across
    members (separator blocks): the tables must contain slot-shared
    duplicates and the kernel must accumulate them correctly."""
    a = poisson2d(12)
    h = init(a, InitOptions(nb=16, dtype="r32", ordering="nd"))
    t = h.schedule.group_mega_tables(h.blocked.num_tiles, gmax=16)
    assert _group_tables_have_shared_dsts(t), \
        "no duplicate dsts — slot machinery untested by this fixture"


@pytest.mark.slow
def test_group_small_gmax_splits_wide_levels():
    """gmax smaller than the widest super-level forces group
    splitting; results must be unchanged."""
    a = poisson2d(24)
    h = init(a, InitOptions(nb=16, dtype="r32", ordering="nd"))
    wide = max(len(m) for m in h.schedule.superlevels())
    assert wide > 2
    bk = get_backend("pallas", nb=16, dtype=h.blocked.dtype)
    grp = LUFactorizer(h.blocked, h.schedule, backend=bk,
                       dispatch="mega_group")
    grp.GROUP_GMAX = 2  # instance override
    grp2 = LUFactorizer(h.blocked, h.schedule, backend=bk,
                        dispatch="mega_group")
    # rebuild tables at gmax=2
    grp2._mega = {
        k: (v if isinstance(v, int) else jnp.asarray(v))
        for k, v in h.schedule.group_mega_tables(
            h.blocked.num_tiles, gmax=2).items()}
    nt = h.blocked.num_tiles
    t1 = np.asarray(grp.factorize())
    t2 = np.asarray(grp2.factorize())
    np.testing.assert_allclose(t1[:nt], t2[:nt], rtol=1e-5, atol=1e-5)


def test_group_multi_update_chunks():
    """Groups with more updates than uch exercise the multi-chunk
    stream, cross-chunk duplicate dsts, and end-of-chunk flagged
    waits."""
    from pangulu_tpu.ops.kernels_jax import DEFAULT_TOL
    from pangulu_tpu.ops.kernels_pallas import mega_factorize_groups

    a = poisson2d(12)
    h = init(a, InitOptions(nb=16, dtype="r32", ordering="nd"))
    nt = h.blocked.num_tiles
    ref = np.asarray(LUFactorizer(h.blocked, h.schedule,
                                  backend=get_backend("jax"),
                                  dispatch="fused").factorize())
    t = {k: (v if isinstance(v, int) else jnp.asarray(v))
         for k, v in h.schedule.group_mega_tables(
             nt, uch=8, gmax=16).items()}
    assert int(np.max(np.asarray(t["nup_tab"]))) > 8
    tiles, invs = mega_factorize_groups(
        h.blocked.device_tiles(), t["gs_tab"], t["nup_tab"],
        t["gdiag_tab"], t["glev_tab"], t["gloff_tab"], t["guoff_tab"],
        t["lid_tab"], t["uid_tab"], t["udst_tab"], t["udl_tab"],
        t["udu_tab"], nb=16,
        tol=float(DEFAULT_TOL[jnp.dtype(np.float32)]),
        ng=t["ngroups"], gmax=t["gmax"], pch=t["pch"], uch=t["uch"],
        bl=h.schedule.block_length)
    np.testing.assert_allclose(np.asarray(tiles)[:nt], ref[:nt],
                               rtol=2e-4, atol=2e-4)


def test_group_auto_dispatch_rule():
    """RCM bands (pure chains) stay on the chain kernel; ND schedules
    with compression pick the group kernel — on TPU backends only
    (auto never selects Pallas engines on CPU; force via dispatch)."""
    a = poisson2d(12)
    h = init(a, InitOptions(nb=16, dtype="r32", ordering="rcm"))
    fac = LUFactorizer(h.blocked, h.schedule,
                       backend=get_backend("jax"))
    assert not fac._group_worthwhile()
    h2 = init(a, InitOptions(nb=16, dtype="r32", ordering="nd"))
    fac2 = LUFactorizer(h2.blocked, h2.schedule,
                        backend=get_backend("jax"))
    assert fac2._group_worthwhile()


@pytest.mark.parametrize("gen,kw,ordering,nb", [
    pytest.param(poisson2d, dict(nx=12), "nd", 16,
                 marks=pytest.mark.slow),
    pytest.param(smallworld, dict(nx=14), "nd", 16,
                 marks=pytest.mark.slow),
    pytest.param(poisson2d, dict(nx=8), "rcm", 16,
                 marks=pytest.mark.slow),   # singleton groups (G=1)
])
def test_group_solve_matches_fused(gen, kw, ordering, nb):
    """Batched-group mega solve (forced on) must match the XLA fused
    solve for single and multi RHS, on compressing AND chain
    schedules."""
    from pangulu_tpu.sptrsv import TriangularSolver

    a = gen(**kw)
    h = init(a, InitOptions(nb=nb, dtype="r32", ordering=ordering))
    bk = get_backend("pallas", nb=nb, dtype=h.blocked.dtype)
    fac = LUFactorizer(h.blocked, h.schedule, backend=bk,
                       dispatch="mega")
    tiles = fac.factorize()
    ts = TriangularSolver(h.blocked, h.schedule, backend=bk,
                          inv_tiles=fac.inv_tiles)
    import os

    os.environ["PANGULU_TPU_SOLVE_GROUP"] = "1"
    try:
        b = np.asarray(h.reordering.reordered.to_scipy()
                       @ np.ones(a.n), dtype=np.float32)
        x_grp = ts._solve_mega(jnp.asarray(tiles), b)
        x_ref = ts.solve(tiles, b)  # XLA fused (mega gated off on CPU)
        np.testing.assert_allclose(x_grp, x_ref, rtol=1e-4, atol=1e-5)
        B = np.stack([b, 2 * b, -b], axis=1)
        np.testing.assert_allclose(
            ts._solve_mega(jnp.asarray(tiles), B), ts.solve(tiles, B),
            rtol=1e-4, atol=1e-5)
    finally:
        del os.environ["PANGULU_TPU_SOLVE_GROUP"]


def test_group_solve_worthwhile_rule():
    from pangulu_tpu.sptrsv import TriangularSolver

    a = poisson2d(12)
    h = init(a, InitOptions(nb=16, dtype="r32", ordering="nd"))
    ts = TriangularSolver(h.blocked, h.schedule)
    assert ts._solve_group_worthwhile()
    h2 = init(poisson2d(8), InitOptions(nb=16, dtype="r32",
                                        ordering="rcm"))
    ts2 = TriangularSolver(h2.blocked, h2.schedule)
    assert not ts2._solve_group_worthwhile()
