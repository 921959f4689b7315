"""Mixed-precision iterative refinement: f32 factorization + f64
residual correction should reach ~f64 solve accuracy."""

import numpy as np

from pangulu_tpu.api import InitOptions, gstrf, gstrs, init
from pangulu_tpu.io.mmio import generated_rhs
from pangulu_tpu.models import poisson2d
from pangulu_tpu.utils.perf import residual_norm


def test_refinement_improves_r32():
    a = poisson2d(10)
    b = generated_rhs(a)
    h = init(a, InitOptions(nb=16, dtype="r32"))
    gstrf(h)
    x0 = gstrs(h, b, refine=0)
    x2 = gstrs(h, b, refine=3)
    r0 = residual_norm(a.to_scipy(), x0, b)
    r2 = residual_norm(a.to_scipy(), x2, b)
    assert r2 < r0 / 10
    assert r2 < 1e-6


def test_refinement_auto_default_for_r32():
    a = poisson2d(8)
    b = generated_rhs(a)
    h = init(a, InitOptions(nb=16, dtype="r32"))
    gstrf(h)
    x = gstrs(h, b)  # auto => 2 rounds for r32
    assert residual_norm(a.to_scipy(), x, b) < 1e-6


def test_refinement_complex():
    from pangulu_tpu.models import random_unsymmetric

    a = random_unsymmetric(60, 0.06, dtype=np.complex128).astype(np.complex64)
    from pangulu_tpu.sparse import CscMatrix

    a = CscMatrix(a.n, a.colptr, a.rowidx, a.values.astype(np.complex64))
    rng = np.random.default_rng(5)
    xt = (rng.standard_normal(a.n) + 1j * rng.standard_normal(a.n)).astype(
        np.complex64)
    b = a.to_scipy() @ xt
    h = init(a, InitOptions(nb=16, dtype="cr32"))
    gstrf(h)
    x = gstrs(h, b, refine=3)
    assert residual_norm(a.to_scipy(), x, b) < 1e-5
