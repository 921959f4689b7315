"""Matrix IO: MatrixMarket and simple binary-vector formats.

Counterpart of the reference's vendored MatrixMarket reader
(``examples/mmio_highlevel.h``, ~900 LoC C) — here a thin layer over
``scipy.io`` (the idiomatic Python path) plus the RHS-file convention of
the reference example driver (``examples/example.c:100-164,252-266``).
"""

from __future__ import annotations

import numpy as np
import scipy.io
import scipy.sparse as sp

from pangulu_tpu.sparse import CscMatrix


def read_matrix(path, dtype=None) -> CscMatrix:
    """Read a MatrixMarket ``.mtx`` file into CSC.

    Symmetric / skew / hermitian storage is expanded to a full general
    pattern (the reference does the same on read).  ``dtype`` optionally
    casts values (pattern matrices get ones).
    """
    a = scipy.io.mmread(str(path))
    a = sp.csc_matrix(a)
    if dtype is not None:
        a = a.astype(dtype)
    a.sum_duplicates()
    a.sort_indices()
    return CscMatrix.from_scipy(a)


def write_matrix(path, a: CscMatrix) -> None:
    scipy.io.mmwrite(str(path), a.to_scipy())


def read_rhs(path, n: int, dtype) -> np.ndarray:
    """Read a right-hand side: one value per line (reference example's
    ``-r rhs`` file), or a MatrixMarket dense vector."""
    path = str(path)
    if path.endswith(".mtx"):
        b = np.asarray(scipy.io.mmread(path)).reshape(-1)
    else:
        b = np.loadtxt(path).reshape(-1)
    if b.shape[0] != n:
        raise ValueError(f"rhs length {b.shape[0]} != n {n}")
    return b.astype(dtype)


def generated_rhs(a: CscMatrix) -> np.ndarray:
    """Default rhs ``b = A @ 1`` so the exact solution is the ones
    vector (reference: examples/example.c:252-266)."""
    return np.asarray(a.to_scipy() @ np.ones(a.n, dtype=a.values.dtype))
