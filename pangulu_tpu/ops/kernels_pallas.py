"""Pallas TPU kernels — the hand-written hot-op backend.

Counterpart of the reference's CUDA platform
(platforms/.../pangulu_platform_0201000.cu): where the reference writes
warp-level CUDA kernels for GETRF/TSTRF/GESSM/SSSSM, we write Mosaic
kernels for the ops where XLA's generic lowering leaves time on the
table.  The single biggest one is the per-level diagonal step: an
nb x nb unpivoted LU plus both triangle inverses, fully VMEM-resident
(the factorization's sequential critical path — one per elimination
level, pangulu_platform_0201000.cu:547-641 is the reference's version
via cusolver).

Design:
  * the tile lives in VMEM for the whole kernel; the rank-1 LU loop is
    a real in-kernel loop (no XLA op dispatch per step);
  * triangle inverses use exact Newton–Schulz doubling — log2(nb)
    MXU matmul pairs (see kernels_jax.unit_lower_inv_newton);
  * off the TPU the kernel runs in interpreter mode so the backend is
    testable everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangulu_tpu.ops import kernels_jax as kj
from pangulu_tpu.ops.interface import KernelBackend


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _getrf_inv_kernel(a_ref, f_ref, linv_ref, uinv_ref, *, nb, tol):
    dt = a_ref.dtype
    rows = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    eye = jnp.where(
        lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
        == lax.broadcasted_iota(jnp.int32, (nb, nb), 1),
        jnp.ones((), dt), jnp.zeros((), dt))

    # ---- unpivoted LU: in-kernel rank-1 loop ------------------------
    # Mosaic requires lane-dimension indices to be 128-aligned, so row/
    # column/pivot extraction uses masked reductions (full-tile VPU
    # ops) instead of dynamic slices.
    rows_f = lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    cols_f = lax.broadcasted_iota(jnp.int32, (nb, nb), 1)

    def lu_body(k, f):
        rowv = jnp.sum(jnp.where(rows_f == k, f, jnp.zeros((), dt)),
                       axis=0, keepdims=True)           # (1, nb)
        colv = jnp.sum(jnp.where(cols_f == k, f, jnp.zeros((), dt)),
                       axis=1, keepdims=True)           # (nb, 1)
        piv = jnp.sum(jnp.where(cols[0:1, :] == k, rowv,
                                jnp.zeros((), dt)),
                      axis=1, keepdims=True)            # (1, 1)
        safe = jnp.where(jnp.abs(piv) < tol, jnp.asarray(tol, dt), piv)
        below = rows > k
        right = cols > k
        lcol = jnp.where(below, colv / safe, jnp.zeros((), dt))
        urow = jnp.where(right, rowv, jnp.zeros((), dt))
        f = f - lcol * urow
        newcol = jnp.where(below, lcol, colv)
        newcol = jnp.where(rows == k, safe, newcol)
        return jnp.where(cols_f == k, newcol, f)

    f = lax.fori_loop(0, nb, lu_body, a_ref[:, :])
    f_ref[:, :] = f

    # ---- Newton–Schulz doubling inverses (exact, MXU) ---------------
    steps = max((nb - 1).bit_length() - 1, 0)
    lower = lax.broadcasted_iota(jnp.int32, (nb, nb), 0) > \
        lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    upper = lax.broadcasted_iota(jnp.int32, (nb, nb), 0) < \
        lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    lmat = jnp.where(lower, f, jnp.zeros((), dt)) + eye
    x = 2 * eye - lmat

    # Mosaic only lowers DEFAULT/HIGHEST dot precision — pin HIGHEST so
    # an ambient jax.default_matmul_precision("high") context (legal
    # for the XLA-level panel/Schur matmuls) can't leak into the kernel.
    _dot = functools.partial(jnp.dot, preferred_element_type=dt,
                             precision=lax.Precision.HIGHEST)

    def newton_l(_, x):
        return _dot(x, 2 * eye - _dot(lmat, x))

    linv_ref[:] = lax.fori_loop(0, steps, newton_l, x)

    dvec = jnp.sum(jnp.where(
        lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
        == lax.broadcasted_iota(jnp.int32, (nb, nb), 1),
        f, jnp.zeros((), dt)), axis=0, keepdims=True)  # (1, nb) diagonal
    dsafe = jnp.where(jnp.abs(dvec) < tol, jnp.asarray(tol, dt), dvec)
    dinv_row = 1.0 / dsafe                     # (1, nb)
    m = jnp.where(upper, f, jnp.zeros((), dt)) * (dinv_row.T)  # D^-1 R
    umat = eye + m
    y = 2 * eye - umat

    def newton_u(_, y):
        return _dot(y, 2 * eye - _dot(umat, y))

    y = lax.fori_loop(0, steps, newton_u, y)
    uinv_ref[:] = y * dinv_row


@functools.partial(jax.jit, static_argnames=("tol",))
def getrf_with_inverses(a, tol=None):
    """Fused diagonal step as one Pallas kernel: (f, L^-1, U^-1)."""
    nb = a.shape[-1]
    dt = a.dtype
    if tol is None:
        tol = float(kj.DEFAULT_TOL[jnp.dtype(dt)])
    out = pl.pallas_call(
        functools.partial(_getrf_inv_kernel, nb=nb, tol=tol),
        out_shape=(
            jax.ShapeDtypeStruct((nb, nb), dt),
            jax.ShapeDtypeStruct((nb, nb), dt),
            jax.ShapeDtypeStruct((nb, nb), dt),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(a)
    return out


def getrf(a, tol=None):
    return getrf_with_inverses(a, tol)[0]


def make_backend() -> KernelBackend:
    """Pallas backend: hand-written diag step, jnp for the rest (the
    batched panel/Schur matmuls already hit the MXU optimally through
    XLA)."""
    return KernelBackend(
        name="pallas",
        getrf=getrf,
        getrf_batched=lambda tiles, tol=None: jax.vmap(
            lambda t: getrf(t, tol))(tiles),
        tstrf=kj.tstrf,
        gessm=kj.gessm,
        ssssm=kj.ssssm,
        diag_inverses=kj.diag_inverses,
        diag_factor_invert=getrf_with_inverses,
        trsv_lower_unit=kj.trsv_lower_unit,
        trsv_upper=kj.trsv_upper,
        spmv_sub=kj.spmv_sub,
    )
