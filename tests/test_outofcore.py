"""Out-of-core panel factorization (pangulu_tpu/outofcore.py):
compressed at rest, mega-kernel per panel cross, XLA out-updates.
Interpret mode on CPU; the driver's on-chip sweep covers Mosaic."""

import numpy as np
import pytest

from pangulu_tpu.blocks import gather_factor, tile_matrix
from pangulu_tpu.io.mmio import generated_rhs
from pangulu_tpu.models import circuit, poisson2d, smallworld
from pangulu_tpu.numeric import LUFactorizer
from pangulu_tpu.ops.interface import get_backend
from pangulu_tpu.outofcore import PanelLU
from pangulu_tpu.reorder import reorder
from pangulu_tpu.schedule import build_schedule
from pangulu_tpu.symbolic import symbolic
from pangulu_tpu.utils.perf import factorization_residual, residual_norm


def _problem(a, nb, ordering="rcm"):
    ro = reorder(a, ordering=ordering, nb=nb)
    symb = symbolic(ro.reordered, nb)
    blocked = tile_matrix(ro.reordered, symb)
    return ro, blocked, build_schedule(blocked)


@pytest.mark.parametrize("gen,kw,nb,w", [
    (poisson2d, dict(nx=9), 8, 3),     # several panels + remainder
    pytest.param(smallworld, dict(nx=12), 16, 2,
                 marks=pytest.mark.slow),  # irregular fill, tiny panels
    pytest.param(circuit, dict(n=500, seed=3), 16, 4,
                 marks=pytest.mark.slow),
])
def test_panel_lu_matches_dense_fused(gen, kw, nb, w):
    """The panel driver must reproduce the dense fused engine on the
    factored compressed store (bit-close; identical math, reordered
    sums only across panels)."""
    a = gen(**kw)
    ro, blocked, schedule = _problem(a, nb)
    ref = np.asarray(LUFactorizer(blocked, schedule,
                                  backend=get_backend("jax"),
                                  dispatch="fused").factorize())
    bk = get_backend("pallas", nb=nb, dtype=blocked.dtype)
    plu = PanelLU(blocked, schedule, ro.reordered, backend=bk,
                  panel_width=w)
    st = plu.factorize()
    nt = blocked.num_tiles
    got = np.asarray(st)
    np.testing.assert_allclose(got[:nt], ref[:nt], rtol=2e-4, atol=2e-4)
    lm, um = gather_factor(blocked, got)
    res = factorization_residual(ro.reordered.to_scipy(), lm, um)
    assert res < 1e-4, res


@pytest.mark.slow
def test_panel_lu_end_to_end_solve():
    a = poisson2d(10)
    ro, blocked, schedule = _problem(a, 8)
    bk = get_backend("pallas", nb=8, dtype=blocked.dtype)
    plu = PanelLU(blocked, schedule, ro.reordered, backend=bk,
                  panel_width=4)
    plu.factorize()
    b = generated_rhs(a)
    w = plu.solve(ro.transform_b(b))
    x = ro.transform_x(w)
    assert residual_norm(a.to_scipy(), x, b) < 1e-3  # f32, no refine


@pytest.mark.slow
def test_panel_lu_single_panel_equals_compressed():
    """panel_width >= bl: one cross = the whole matrix; the store must
    match the existing compressed engine exactly (same staging math)."""
    from pangulu_tpu.compressed import CompressedLU

    a = smallworld(10, seed=2)
    ro, blocked, schedule = _problem(a, 16)
    bk = get_backend("pallas", nb=16, dtype=blocked.dtype)
    plu = PanelLU(blocked, schedule, ro.reordered, backend=bk,
                  panel_width=schedule.block_length)
    st = plu.factorize()
    clu = CompressedLU(blocked, schedule, ro.reordered,
                       backend=get_backend("jax"))
    st2 = clu.factorize()
    np.testing.assert_allclose(np.asarray(st), np.asarray(st2),
                               rtol=2e-4, atol=2e-4)


def test_panel_lu_adaptive_hbm_split(monkeypatch):
    """HBM-aware splitting: with a tiny dense-cross budget the driver
    must halve panel widths below panel_width (the >16 GB demo OOM
    class: one panel's REAL cross far exceeding the average-based
    width heuristic) and still reproduce the fused engine."""
    a = poisson2d(16)
    ro, blocked, schedule = _problem(a, 8)
    bl = schedule.block_length
    bk = get_backend("pallas", nb=8, dtype=blocked.dtype)
    monkeypatch.setenv("PANGULU_OOC_CROSS_GB", "1e-9")  # floor: 64 tiles
    plu = PanelLU(blocked, schedule, ro.reordered, backend=bk,
                  panel_width=bl)
    st = plu.factorize()
    assert len(plu.panel_cols) > 1, "budget did not force a split"
    assert all(len(plu._cross_ids(c0, c1)) <= 64
               or c1 - c0 == 1 for c0, c1 in plu.panel_cols)
    assert plu.panel_cols[0][0] == 0 and plu.panel_cols[-1][1] == bl
    ref = np.asarray(LUFactorizer(blocked, schedule,
                                  backend=get_backend("jax"),
                                  dispatch="fused").factorize())
    nt = blocked.num_tiles
    np.testing.assert_allclose(np.asarray(st)[:nt], ref[:nt],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_panel_lu_tiny_out_chunk():
    """Force many small out-update chunks (dst-group splitting)."""
    a = smallworld(12, seed=7)
    ro, blocked, schedule = _problem(a, 8)
    bk = get_backend("pallas", nb=8, dtype=blocked.dtype)
    plu = PanelLU(blocked, schedule, ro.reordered, backend=bk,
                  panel_width=3, out_chunk=2)
    st = plu.factorize()
    ref = np.asarray(LUFactorizer(blocked, schedule,
                                  backend=get_backend("jax"),
                                  dispatch="fused").factorize())
    nt = blocked.num_tiles
    np.testing.assert_allclose(np.asarray(st)[:nt], ref[:nt],
                               rtol=2e-4, atol=2e-4)
