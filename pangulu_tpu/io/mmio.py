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


def _read_mtx_native(path):
    """Native C++ coordinate-mtx reader (native/pangulu_host.cpp
    pangulu_mmio_read — the counterpart of the reference's vendored C
    reader, examples/mmio_highlevel.h; measured at parity with scipy's
    fast_matrix_market engine).  Returns a scipy matrix or None
    (gz / dense / array variants fall back to scipy)."""
    if str(path).endswith(".gz"):
        return None
    from pangulu_tpu import native

    try:
        out = native.mmio_read(path)
    except Exception:
        return None
    if out is None:
        return None
    nrows, ncols, rows, cols, vals, symmetry = out
    a = sp.coo_matrix((vals, (rows, cols)), shape=(nrows, ncols))
    if symmetry:  # expand symmetric / skew / hermitian storage
        off = rows != cols
        v = vals[off]
        if symmetry == 2:
            v = -v
        elif symmetry == 3:
            v = np.conj(v)
        a = a + sp.coo_matrix((v, (cols[off], rows[off])),
                              shape=(nrows, ncols))
    return sp.csc_matrix(a)


def read_matrix(path, dtype=None) -> CscMatrix:
    """Read a sparse matrix into CSC.

    Formats: MatrixMarket ``.mtx`` (also ``.mtx.gz``; symmetric / skew
    / hermitian storage expanded to full general pattern, like the
    reference reader) and the binary ``.npz`` written by
    :func:`write_matrix` (the counterpart of the reference's binary
    ``.lid`` CSR fast path, examples/example.c:100-164).  ``dtype``
    optionally casts values (pattern matrices get ones).
    """
    path = str(path)
    if path.endswith(".npz"):
        z = np.load(path, allow_pickle=False)
        n = int(z["shape"][0])
        a = sp.csc_matrix((z["data"], z["indices"], z["indptr"]),
                          shape=(n, int(z["shape"][1])))
    else:
        a = _read_mtx_native(path)
        if a is None:
            a = sp.csc_matrix(scipy.io.mmread(path))
    if dtype is not None:
        a = a.astype(dtype)
    a.sum_duplicates()
    a.sort_indices()
    return CscMatrix.from_scipy(a)


def write_matrix(path, a: CscMatrix) -> None:
    """Write ``.mtx`` (text) or ``.npz`` (binary CSC — loads orders of
    magnitude faster for large matrices, like the reference's binary
    ``.lid`` format)."""
    path = str(path)
    s = a.to_scipy()
    if path.endswith(".npz"):
        np.savez_compressed(path, indptr=s.indptr, indices=s.indices,
                            data=s.data, shape=np.asarray(s.shape))
    else:
        scipy.io.mmwrite(path, s)


def read_rhs(path, n: int, dtype) -> np.ndarray:
    """Read a right-hand side: one value per line (reference example's
    ``-r rhs`` file), a MatrixMarket dense vector, or binary ``.npy``/
    ``.npz`` (key ``b``)."""
    path = str(path)
    if path.endswith(".mtx"):
        b = np.asarray(scipy.io.mmread(path)).reshape(-1)
    elif path.endswith(".npy"):
        b = np.load(path).reshape(-1)
    elif path.endswith(".npz"):
        b = np.load(path)["b"].reshape(-1)
    else:
        b = np.loadtxt(path).reshape(-1)
    if b.shape[0] != n:
        raise ValueError(f"rhs length {b.shape[0]} != n {n}")
    return b.astype(dtype)


def generated_rhs(a: CscMatrix) -> np.ndarray:
    """Default rhs ``b = A @ 1`` so the exact solution is the ones
    vector (reference: examples/example.c:252-266)."""
    return np.asarray(a.to_scipy() @ np.ones(a.n, dtype=a.values.dtype))
