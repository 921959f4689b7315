"""Reordering tests: MC64-equivalent matching/scaling + fill-reducing
orderings (reference has no tests; oracle = mathematical invariants)."""

import numpy as np
import scipy.sparse as sp

from pangulu_tpu.models import arrowhead, poisson2d, trefethen
from pangulu_tpu.reorder import fill_reducing_order, mc64_scale_and_match, reorder
from pangulu_tpu.sparse import CscMatrix


def test_matching_puts_large_entries_on_diagonal():
    rng = np.random.default_rng(0)
    n = 40
    # random permutation with huge entries off-diagonal
    perm = rng.permutation(n)
    a = sp.lil_matrix((n, n))
    for i in range(n):
        a[i, perm[i]] = 10.0 + rng.random()
    a = a + sp.random(n, n, density=0.1, random_state=rng) * 0.01
    a = CscMatrix.from_scipy(sp.csc_matrix(a))
    dr, dc, colperm = mc64_scale_and_match(a)
    s = sp.diags(dr) @ a.to_scipy() @ sp.diags(dc)
    s = sp.csc_matrix(s)[:, colperm]
    d = np.abs(s.diagonal())
    assert (d > 0).all()
    # every diagonal entry should be ~the max of its column
    dense = np.abs(s.todense())
    colmax = np.asarray(dense.max(axis=0)).ravel()
    assert np.all(d >= 0.5 * colmax)


def test_matching_identity_fallback_on_singular():
    # structurally singular: an empty column
    a = sp.lil_matrix((5, 5))
    a[0, 0] = a[1, 1] = a[2, 2] = a[3, 3] = 1.0
    a[4, 0] = 1.0  # column 4 empty
    a = CscMatrix.from_scipy(sp.csc_matrix(a))
    _, _, colperm = mc64_scale_and_match(a)
    assert (colperm == np.arange(5)).all()


def test_fill_reducing_is_permutation():
    a = poisson2d(8)
    for method in ("rcm", "mindeg", "natural"):
        p = fill_reducing_order(a, method)
        assert sorted(p) == list(range(a.n))


def test_mindeg_beats_natural_on_arrowhead():
    a = arrowhead(60)
    import scipy.sparse.linalg as spla

    def fill(perm):
        s = sp.csc_matrix(a.to_scipy())[perm][:, perm]
        lu = spla.splu(s.tocsc(), permc_spec="NATURAL",
                       options=dict(SymmetricMode=False))
        return lu.L.nnz + lu.U.nnz

    p = fill_reducing_order(a, "mindeg")
    assert fill(p) < fill(np.arange(a.n)) / 2


def test_reorder_roundtrip_transforms():
    a = trefethen(20)
    ro = reorder(a)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(a.n)
    b = a.to_scipy() @ x
    # A3 w = transform_b(b) should have solution w with transform_x(w) = x
    bt = ro.transform_b(b)
    w = np.linalg.solve(ro.reordered.to_scipy().todense(), bt)
    x_rec = ro.transform_x(np.asarray(w).ravel())
    np.testing.assert_allclose(x_rec, x, rtol=1e-9, atol=1e-9)


def test_nested_dissection_ordering():
    from pangulu_tpu.reorder.fill_reducing import fill_reducing_order

    for a in (poisson2d(20), arrowhead(150)):
        p = fill_reducing_order(a, method="nd")
        assert sorted(p) == list(range(a.n))  # a permutation

    # end-to-end correctness under nd
    from pangulu_tpu.api import InitOptions, gssv, init
    from pangulu_tpu.utils.perf import residual_norm

    a = poisson2d(15)
    b = np.asarray(a.to_scipy() @ np.ones(a.n))
    h = init(a, InitOptions(nb=16, dtype="r64", ordering="nd"))
    x = gssv(h, b)
    assert residual_norm(a.to_scipy(), x, b) < 1e-10
