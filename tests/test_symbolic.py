"""Symbolic factorization tests: fill pattern must cover the true LU
fill (oracle: scipy splu with natural ordering)."""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from pangulu_tpu.models import poisson2d, trefethen
from pangulu_tpu.sparse import CscMatrix
from pangulu_tpu.symbolic import elimination_tree, symbolic


def _true_fill_blocks(a, nb):
    """Block pattern of the exact LU factors (natural order, no pivot)."""
    lu = spla.splu(a.to_scipy().tocsc(), permc_spec="NATURAL",
                   diag_pivot_thresh=0.0,
                   options=dict(SymmetricMode=True))
    pat = (abs(lu.L) + abs(lu.U)).tocoo()
    bl = -(-a.n // nb)
    mark = np.zeros((bl, bl), dtype=bool)
    mark[pat.row // nb, pat.col // nb] = True
    return mark


def test_scalar_symbolic_covers_true_fill():
    for a, nb in [(trefethen(20), 4), (poisson2d(8), 8)]:
        symb = symbolic(a, nb, mode="scalar")
        ours = np.asarray(symb.block_full.todense()) > 0
        true = _true_fill_blocks(a, nb)
        assert (ours | ~true).all(), "symbolic pattern misses true fill"


def test_block_symbolic_superset_of_scalar():
    a = poisson2d(8)
    s_scalar = symbolic(a, 8, mode="scalar")
    s_block = symbolic(a, 8, mode="block")
    sc = np.asarray(s_scalar.block_full.todense()) > 0
    bk = np.asarray(s_block.block_full.todense()) > 0
    assert (bk | ~sc).all()


def test_etree_parent_ordering():
    a = poisson2d(6)
    from pangulu_tpu.sparse import symmetrize_pattern

    parent = elimination_tree(symmetrize_pattern(a))
    n = a.n
    for j in range(n):
        assert parent[j] == -1 or parent[j] > j


def test_symbolic_nnz_matches_dense_bound():
    a = trefethen(20)
    symb = symbolic(a, 4, mode="scalar")
    # |L|+|U| of symmetric symbolic is between nnz(A) and n^2
    assert a.nnz <= symb.symbolic_nnz <= a.n * a.n
