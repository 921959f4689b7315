"""Pallas TPU kernels — the hand-written hot-op backend.

Counterpart of the reference's CUDA platform
(platforms/.../pangulu_platform_0201000.cu): where the reference
launches warp-level CUDA kernels per task, we launch ONE Mosaic kernel
per PHASE:

  * :func:`mega_factorize` — the ENTIRE numeric factorization in one
    pallas_call: tiles resident in HBM; per elimination level the
    kernel streams its index tables HBM->SMEM (double-buffered), DMAs
    the diagonal tile to VMEM, runs the rank-1 LU + triangle
    inverses in-core, solves L/U panels in VMEM chunks as
    flat MXU matmuls, and applies Schur updates sorted by (u-chunk,
    l-chunk, l) so one row-product dot serves all updates sharing an
    L block.  The inverses are persisted for the solve.
  * :func:`mega_solve` — the entire forward+backward SpTRSV in one
    pallas_call: x lives in VMEM, every step is an MXU contraction
    against the persisted inverses (no substitution loops).
  * :func:`getrf_with_inverses` — the standalone per-tile diagonal
    step, used by the portable XLA engines.

Design notes:
  * the rank-1 LU loop uses masked-reduction row/column extraction
    (Mosaic lane slicing must be 128-aligned) and defers L scaling to
    one whole-triangle pass at the end;
  * triangle inverses use exact Newton–Schulz doubling — log2(nb)
    MXU matmul pairs (see kernels_jax.unit_lower_inv_newton).  The
    scan-RESIDENT alternative (Gauss–Jordan products accumulated
    inside the rank-1 scan, _lu_scan_step_aug, PANGULU_MEGA_INV=scan)
    is implemented and exact but MEASURED SLOWER on v5e: the scan is
    VPU-bandwidth-bound, not latency-bound, so tripling its live
    state costs more than Newton's MXU dots (bench A/B r3: chain
    12.0 -> 12.8 ms, batched-group diag phase 6.3 -> 14.3 ms);
  * off the TPU the kernels run in interpreter mode so every engine is
    testable everywhere (tests pin them against the XLA engines).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangulu_tpu.ops import kernels_jax as kj
from pangulu_tpu.ops.interface import KernelBackend


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def x32_trace(fn):
    """Trace ``fn``'s body with 32-bit jnp defaults regardless of the
    global ``jax_enable_x64`` state (flipped on by any r64/cr64 init
    and by the test conftest).

    Mosaic has no i64/f64: under x64, Python-int literals in kernel
    code become i64 memref/semaphore indices and Python floats become
    f64 constants, all of which fail to lower (observed: tpu.truncf
    f64->f32 'failed to legalize', i64 semaphore memref_slice verifier
    error, and an infinite _convert_element_type recursion).  Every
    input of a wrapped engine is an explicitly-typed <=32-bit array,
    so 32-bit trace semantics are identical — this simply restores the
    x64=off defaults the kernels were designed under.  If a 64-bit
    array leaf is passed (the portable CPU f64 engines share some
    entry points), the context is skipped: inside it, explicit f64
    dtypes would silently truncate.  Off-TPU the context is skipped
    entirely: interpret-mode Pallas handles i64/f64 fine, and the dd
    engines' CPU branch RELIES on explicit f64 upcasts (x32 would
    silently truncate them back to f32 — observed as a dd residual
    collapsing from 1e-13 to 3e-7)."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        if jax.default_backend() != "tpu":
            return fn(*args, **kwargs)
        leaves = jax.tree_util.tree_leaves((args, kwargs))
        if any(getattr(getattr(x, "dtype", None), "itemsize", 0) == 8
               for x in leaves):
            return fn(*args, **kwargs)
        with jax.enable_x64(False):
            return fn(*args, **kwargs)
    # forward the jit wrapper's cache-control surface (tests use it)
    for attr in ("clear_cache", "lower", "trace", "eval_shape"):
        if hasattr(fn, attr):
            setattr(wrapped, attr, getattr(fn, attr))
    return wrapped


def _fori_loop(lo, hi, body, init):
    """``lax.fori_loop`` with i32-coerced Python-int bounds.

    Under ``jax_enable_x64`` (flipped globally by any r64/cr64 init)
    Python-int bounds make the loop counter int64; comparing it against
    i32 iotas inside a Mosaic kernel then emits an i32->i64
    ``convert_element_type`` whose fallback lowering recurses forever
    (jax 0.9.0 ``_convert_helper`` re-emits the same primitive).  Typed
    bounds do NOT help: fori_loop's static-bounds path converts them to
    Python ints and builds a scan whose counter is the default int —
    i64 under x64.  So for static bounds we build the same scan with
    our own i32 carry counter; traced i32 bounds pass through (the
    while_loop path takes its dtype from the operands).  Use this for
    EVERY loop that may trace inside a pallas kernel."""
    if isinstance(lo, (int, np.integer)) and isinstance(hi, (int, np.integer)):
        n = int(hi) - int(lo)
        if n <= 0:
            return init

        def step(c, _):
            k, state = c
            return (k + np.int32(1), body(k, state)), None

        (_, out), _ = lax.scan(step, (np.int32(int(lo)), init), None,
                               length=n)
        return out
    return lax.fori_loop(lo, hi, body, init)


def _lu_scan_step(f, k, *, nb, tol):
    """One rank-1 elimination step of the in-kernel unpivoted LU.

    Mosaic requires lane-dimension indices to be 128-aligned, so row/
    column/pivot extraction uses masked reductions (full-tile VPU ops)
    instead of dynamic slices.  The update leaves column k untouched
    (urow is masked to cols > k), so L columns accumulate UNSCALED —
    one whole-triangle scale in :func:`_lu_finalize` replaces three
    per-iteration writeback merges.  Split out of :func:`_lu_inverses`
    so the super-level kernel can advance a NEXT level's scan one step
    at a time interleaved with the current level's Schur dots."""
    dt = f.dtype
    tol = np.dtype(dt).type(tol)  # strong scalar: a weak Python float
    # materializes as an f64 constant under x64 (untype-able truncf in Mosaic)
    rows = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    rows_f = lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    cols_f = lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
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
    return f - lcol * urow


def _lu_scan_step2(f, k, *, nb, tol):
    """TWO rank-1 elimination steps (k, k+1) fused into one loop
    iteration: row/column k+1 are extracted raw and locally corrected
    by step k's contribution, then both outer-product updates apply in
    a single read-modify-write of ``f``.  Halves the scan's serial
    f-update rounds (the recurrence bound) at the same masked-reduce
    count.  Exact same arithmetic DAG per entry as two single steps
    except the f-update order (one fused FMA pair), so results match
    the single-step scan to f32 rounding."""
    dt = f.dtype
    tol = np.dtype(dt).type(tol)
    k2 = k + 1
    rows = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    rows_f = lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    cols_f = lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    rowv = jnp.sum(jnp.where(rows_f == k, f, jnp.zeros((), dt)),
                   axis=0, keepdims=True)            # (1, nb)
    colv = jnp.sum(jnp.where(cols_f == k, f, jnp.zeros((), dt)),
                   axis=1, keepdims=True)            # (nb, 1)
    rowv2 = jnp.sum(jnp.where(rows_f == k2, f, jnp.zeros((), dt)),
                    axis=0, keepdims=True)           # (1, nb) raw
    colv2 = jnp.sum(jnp.where(cols_f == k2, f, jnp.zeros((), dt)),
                    axis=1, keepdims=True)           # (nb, 1) raw
    piv = jnp.sum(jnp.where(cols[0:1, :] == k, rowv,
                            jnp.zeros((), dt)),
                  axis=1, keepdims=True)             # (1, 1)
    safe = jnp.where(jnp.abs(piv) < tol, jnp.asarray(tol, dt), piv)
    lcol = jnp.where(rows > k, colv / safe, jnp.zeros((), dt))
    urow = jnp.where(cols > k, rowv, jnp.zeros((), dt))
    # step k's contribution to row/col k+1: the scalars L[k+1,k] and
    # U[k,k+1]
    l_k2 = jnp.sum(jnp.where(rows == k2, lcol, jnp.zeros((), dt)),
                   axis=0, keepdims=True)            # (1, 1)
    u_k2 = jnp.sum(jnp.where(cols[0:1, :] == k2, urow,
                             jnp.zeros((), dt)),
                   axis=1, keepdims=True)            # (1, 1)
    rowv2 = rowv2 - l_k2 * urow
    colv2 = colv2 - lcol * u_k2
    piv2 = jnp.sum(jnp.where(cols[0:1, :] == k2, rowv2,
                             jnp.zeros((), dt)),
                   axis=1, keepdims=True)
    safe2 = jnp.where(jnp.abs(piv2) < tol, jnp.asarray(tol, dt), piv2)
    lcol2 = jnp.where(rows > k2, colv2 / safe2, jnp.zeros((), dt))
    urow2 = jnp.where(cols > k2, rowv2, jnp.zeros((), dt))
    return f - lcol * urow - lcol2 * urow2


def _lu_scan_step_act(f, k, *, r0, m, nb, tol):
    """One rank-1 elimination step restricted to the ACTIVE row window
    [r0, r0+m) of the tile — the same arithmetic as
    :func:`_lu_scan_step` (rows above r0 are final at step k >= r0 and
    receive exactly-zero updates there, so skipping them is bit-exact),
    at window-proportional VPU cost.  The scan is THROUGHPUT-bound on
    its full-tile mask/select/update passes (measured r4: 15.7 us/level
    at nb=128 where the latency chain alone explains ~half), so
    shrinking the rows each pass touches is the direct lever."""
    dt = f.dtype
    tol = np.dtype(dt).type(tol)
    rows = lax.broadcasted_iota(jnp.int32, (m, 1), 0) + r0
    cols = lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    rows_f = lax.broadcasted_iota(jnp.int32, (m, nb), 0) + r0
    cols_f = lax.broadcasted_iota(jnp.int32, (m, nb), 1)
    rowv = jnp.sum(jnp.where(rows_f == k, f, jnp.zeros((), dt)),
                   axis=0, keepdims=True)           # (1, nb)
    colv = jnp.sum(jnp.where(cols_f == k, f, jnp.zeros((), dt)),
                   axis=1, keepdims=True)           # (m, 1)
    piv = jnp.sum(jnp.where(cols[0:1, :] == k, rowv,
                            jnp.zeros((), dt)),
                  axis=1, keepdims=True)            # (1, 1)
    safe = jnp.where(jnp.abs(piv) < tol, jnp.asarray(tol, dt), piv)
    lcol = jnp.where(rows > k, colv / safe, jnp.zeros((), dt))
    urow = jnp.where(cols > k, rowv, jnp.zeros((), dt))
    return f - lcol * urow


def _lu_scan_sliced(a, *, nb, tol, nq=8):
    """The full rank-1 LU scan in ``nq`` diminishing ROW-WINDOW phases:
    phase p runs steps [p*q, (p+1)*q) on rows [p*q, nb) only — rows
    above the window were finalized by earlier phases.  Bit-exact
    against the plain scan; average VPU traffic drops to
    (nq+1)/(2*nq) of full-tile (0.56x at nq=8)."""
    # small tiles (nb < nq, e.g. nb=8 fixtures) must still run every
    # elimination step: clamp to the largest divisor of nb <= nq
    # (q = nb // nq = 0 would silently skip the whole scan)
    nq = max(1, min(nq, nb))
    while nb % nq:
        nq -= 1
    q = nb // nq
    done = []
    act = a
    for p in range(nq):
        r0 = p * q
        m = nb - r0
        act = _fori_loop(
            r0, r0 + q,
            lambda k, x, r0=r0, m=m: _lu_scan_step_act(
                x, k, r0=r0, m=m, nb=nb, tol=tol), act)
        if p + 1 < nq:
            done.append(lax.slice(act, (0, 0), (q, nb)))
            act = lax.slice(act, (q, 0), (m, nb))
    return lax.concatenate(done + [act], 0)


def _lu_blocked(a, *, nb, tol, r=32):
    """Blocked right-looking LU of one VMEM-resident tile — the MXU
    analogue of the reference's dense blocked cusolver GETRF
    (platforms/.../pangulu_platform_0201000.cu:547-641), redesigned
    for Mosaic's layout rules.

    The plain rank-1 scan (:func:`_lu_scan_step`) advances one column
    per step with THREE full-tile (nb, nb) VPU passes — 128 sequential
    steps with the MXU idle.  Here each r-column panel eliminates with
    rank-1 steps on two (r, nb) buffers (4-8x less VPU traffic per
    step):

      * ``rb``  — the panel's row block  f[k0:k0+r, :]   (U rows);
      * ``ct``  — the panel's column block TRANSPOSED, ct[j, p] =
        f[p, k0+j] (L columns as rows — Mosaic lane slices must be
        128-aligned, so the column block is extracted/written back via
        small MXU selection dots instead of slices);

    and the trailing submatrix update is ONE MXU dot per panel
    (f -= L_panel^T-contraction RBU) instead of r full-tile rank-1
    VPU updates.  In-panel L columns are scaled immediately (the
    trailing dot needs them scaled), so the packed-factor convention
    matches :func:`_lu_finalize` with only a final diagonal clamp.

    Rounding differs from the rank-1 scan only in the trailing
    accumulation order (one fused MXU sum per panel vs r sequential
    subtracts) — same backward error model.
    """
    dt = a.dtype
    tol = np.dtype(dt).type(tol)
    zero = jnp.zeros((), dt)
    hi = lax.Precision.HIGHEST
    rows_r = lax.broadcasted_iota(jnp.int32, (r, nb), 0)
    cols_r = lax.broadcasted_iota(jnp.int32, (r, nb), 1)
    rows_f = lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    cols_f = lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    lane = lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    f = a
    for k0 in range(0, nb, r):
        band = cols_r == rows_r + k0          # in-panel diagonal band
        sel = jnp.where(band, jnp.ones((), dt), zero)
        rb = lax.slice(f, (k0, 0), (k0 + r, nb))
        # ct[j, p] = f[p, k0+j]: contract f's LANE dim against the
        # selection rows — the MXU does the transpose natively
        ct = lax.dot_general(sel, f, (((1,), (1,)), ((), ())),
                             preferred_element_type=dt, precision=hi)

        def step(j, c, k0=k0, band=band):
            rb, ct = c
            k = k0 + j
            urow = jnp.sum(jnp.where(rows_r == j, rb, zero),
                           axis=0, keepdims=True)        # (1, nb)
            lrow = jnp.sum(jnp.where(rows_r == j, ct, zero),
                           axis=0, keepdims=True)        # (1, nb)
            piv = jnp.sum(jnp.where(lane == k, urow, zero),
                          axis=1, keepdims=True)          # (1, 1)
            safe = jnp.where(jnp.abs(piv) < tol,
                             jnp.asarray(tol, dt), piv)
            lt = jnp.where(lane > k, lrow / safe, zero)   # scaled L col
            urow_m = jnp.where(lane > k, urow, zero)
            # in-panel scalar columns: wl[m] = lt[k0+m], wu[m] =
            # urow[k0+m] (zero for m <= j via the lane>k masks)
            wl = jnp.sum(jnp.where(band, lt, zero),
                         axis=1, keepdims=True)           # (r, 1)
            wu = jnp.sum(jnp.where(band, urow_m, zero),
                         axis=1, keepdims=True)           # (r, 1)
            rb = rb - wl * urow_m
            ct = jnp.where(rows_r == j,
                           jnp.where(lane > k, lt, lrow),
                           ct - wu * lt)
            return rb, ct

        rb, ct = _fori_loop(0, r, step, (rb, ct))
        # trailing update: one MXU dot.  In-panel rows/cols receive
        # garbage here and are overwritten by the writebacks below.
        upm = cols_r > rows_r + k0
        rbu = jnp.where(upm, rb, zero)        # U rows, cols > diag
        lts = jnp.where(upm, ct, zero)        # scaled L cols (rows>diag)
        f = f - lax.dot_general(lts, rbu, (((0,), (0,)), ((), ())),
                                preferred_element_type=dt, precision=hi)
        # row-block writeback: static-slice concat (Mosaic lowers
        # neither dynamic_update_slice nor zero-size slices — k0 is a
        # python int, so empty edge parts drop at trace time)
        parts = ([lax.slice(f, (0, 0), (k0, nb))] if k0 else []) + [rb]
        if k0 + r < nb:
            parts.append(lax.slice(f, (k0 + r, 0), (nb, nb)))
        f = lax.concatenate(parts, 0)
        # expand ct back to block columns (rows > col only: the scaled
        # L part; upper rows stayed final in f / came back with rb)
        cte = lax.dot_general(ct, sel, (((0,), (0,)), ((), ())),
                              preferred_element_type=dt, precision=hi)
        colmask = ((cols_f >= k0) & (cols_f < k0 + r)
                   & (rows_f > cols_f))
        f = jnp.where(colmask, cte, f)
    # final diagonal clamp (L already scaled in-panel, same `safe`
    # rule as the per-step scaling)
    dvec = jnp.sum(jnp.where(rows_f == cols_f, f, zero),
                   axis=0, keepdims=True)
    dsafe = jnp.where(jnp.abs(dvec) < tol, jnp.asarray(tol, dt), dvec)
    return jnp.where(rows_f == cols_f, dsafe, f)


def _lu_scan_step_aug(c, k, *, nb, tol):
    """Rank-1 LU step with SCAN-RESIDENT triangle inverses: the same
    elimination as :func:`_lu_scan_step` plus Gauss–Jordan accumulation
    of L^-1 and of Utilde^-T (U = D·Utilde), all VPU work riding the
    scan's existing extractions.

    Identities (exact; verified against numpy inverses):
      L     = (I+l_0 e_0^T)(I+l_1 e_1^T)...          (column overlay)
      L^-1  = (I-l_{nb-1} e^T)...(I-l_0 e_0^T)
            -> G <- G - l_k * G[k,:]   (forward, G_0 = I)
      Utilde^-1 = (I-m_1 e_1^T)(I-m_2 e_2^T)...,  m_k = col k of D^-1 R
      tracked TRANSPOSED so both extractions are row-cheap:
            -> V <- V - e_k (m_k^T V)  (forward, V_0 = I)
      U^-1  = V^T D^-1  (one MXU transpose-dot at the end).

    Replaces the 2*log2(nb) Newton–Schulz MXU dot pairs (48*nb^3 flops
    per diagonal tile — 72x the getrf's own 2/3*nb^3) with ~6 extra VPU
    passes per scan step that pipeline under the scan's own latency-
    bound recurrence.  ``m_k`` needs pivots i<k only, accumulated in
    ``dinvc`` as the scan goes."""
    f, g, v, dinvc = c
    dt = f.dtype
    tol = np.dtype(dt).type(tol)
    one = np.dtype(dt).type(1)
    rows = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    rows_f = lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    cols_f = lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
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
    # L^-1 accumulation (lcol = the FINAL scaled L column k: later
    # steps never touch column k)
    gk = jnp.sum(jnp.where(rows_f == k, g, jnp.zeros((), dt)),
                 axis=0, keepdims=True)             # (1, nb)
    g = g - lcol * gk
    # Utilde^-T accumulation: column k of U is final at step k too
    dinvc = jnp.where(rows == k, one / safe, dinvc)  # (nb, 1)
    mk = jnp.where(rows < k, colv * dinvc, jnp.zeros((), dt))
    mv = jnp.sum(mk * v, axis=0, keepdims=True)      # (1, nb)
    v = jnp.where(rows_f == k, v - mv, v)
    return f, g, v, dinvc


def _eye(nb, dt):
    return jnp.where(
        lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
        == lax.broadcasted_iota(jnp.int32, (nb, nb), 1),
        jnp.ones((), dt), jnp.zeros((), dt))


def _diag_row(f, *, nb):
    """Extract the diagonal of a packed factor as a (1, nb) row."""
    dt = f.dtype
    return jnp.sum(jnp.where(
        lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
        == lax.broadcasted_iota(jnp.int32, (nb, nb), 1),
        f, jnp.zeros((), dt)), axis=0, keepdims=True)


def _transpose_dot(v, *, nb):
    """V^T via one MXU dot against the identity (contract dim 0 of
    both operands: out[m,n] = sum_i v[i,m] eye[i,n] = v[n,m]) — Mosaic
    has no cheap VMEM transpose, the MXU does it natively as a
    transposed-lhs matmul."""
    dt = v.dtype
    return lax.dot_general(
        v, _eye(nb, dt), (((0,), (0,)), ((), ())),
        preferred_element_type=dt, precision=lax.Precision.HIGHEST)


def _lu_finalize(f, *, nb, tol):
    """Finalize the packed factor after the scan: scale L columns by
    1/pivot (with the reference's tiny-pivot substitution) and clamp
    the diagonal."""
    dt = f.dtype
    tol = np.dtype(dt).type(tol)
    one = np.dtype(dt).type(1)
    lower_m = lax.broadcasted_iota(jnp.int32, (nb, nb), 0) > \
        lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    dvec0 = jnp.sum(jnp.where(
        lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
        == lax.broadcasted_iota(jnp.int32, (nb, nb), 1),
        f, jnp.zeros((), dt)), axis=0, keepdims=True)   # (1, nb)
    dsafe0 = jnp.where(jnp.abs(dvec0) < tol, jnp.asarray(tol, dt), dvec0)
    f = jnp.where(lower_m, f * (one / dsafe0), f)
    return jnp.where(lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
                     == lax.broadcasted_iota(jnp.int32, (nb, nb), 1),
                     dsafe0, f)


def _lu_inverses(a, *, nb, tol, inv="newton"):
    """Pure value-level body: unpivoted LU of one VMEM-resident tile +
    exact triangle inverses.  Shared by the standalone diag kernel and
    the whole-factorization mega-kernels.

    ``inv="newton"`` (default, measured faster on v5e — see module
    docstring) is the 2*log2(nb)-dot Newton–Schulz pair;
    ``inv="scan"`` accumulates both inverses INSIDE the rank-1 scan
    (Gauss–Jordan products, :func:`_lu_scan_step_aug`) — zero extra
    MXU work beyond one transpose-dot, but more VPU bandwidth (A/B
    knob PANGULU_MEGA_INV, resolved at trace time by the jit
    wrappers)."""
    if inv == "skip":       # debug timing floor: NO valid numerics
        return a, a, a
    if inv.startswith("blocked"):
        # MXU-blocked right-looking LU (panel width from the mode
        # suffix: blocked8/blocked16/blocked32), Newton inverses
        r = int(inv[len("blocked"):] or 32)
        f = _lu_blocked(a, nb=nb, tol=tol, r=r)
        linv, uinv = _newton_inverses(f, nb=nb, tol=tol)
        return f, linv, uinv
    if inv.startswith("sliced"):
        # diminishing row-window scan (bit-exact vs the plain scan),
        # Newton inverses; suffix = phase count (sliced4/sliced8/...)
        nq = int(inv[len("sliced"):] or 8)
        f = _lu_scan_sliced(a, nb=nb, tol=tol, nq=nq)
        f = _lu_finalize(f, nb=nb, tol=tol)
        linv, uinv = _newton_inverses(f, nb=nb, tol=tol)
        return f, linv, uinv
    if inv in ("newton", "newton2", "scanonly"):
        if inv == "newton2" and nb % 2 == 0:
            # rank-2 fused steps: measured a wash on v5e (rcm bench
            # 11.9 -> 12.2 ms) — the correction-scalar chain is as
            # long as two single steps; kept as an A/B mode
            f = _fori_loop(
                0, nb // 2,
                lambda t, f: _lu_scan_step2(f, 2 * t, nb=nb, tol=tol),
                a)
        else:
            f = _fori_loop(
                0, nb,
                lambda k, f: _lu_scan_step(f, k, nb=nb, tol=tol), a)
        f = _lu_finalize(f, nb=nb, tol=tol)
        if inv == "scanonly":   # debug timing: NO valid inverses
            return f, f, f
        linv, uinv = _newton_inverses(f, nb=nb, tol=tol)
        return f, linv, uinv
    dt = a.dtype
    eye = _eye(nb, dt)
    c0 = (a, eye, eye, jnp.zeros((nb, 1), dt))
    f, g, v, _ = _fori_loop(
        0, nb, lambda k, c: _lu_scan_step_aug(c, k, nb=nb, tol=tol), c0)
    f = _lu_finalize(f, nb=nb, tol=tol)
    one = np.dtype(dt).type(1)
    uinv = _transpose_dot(v, nb=nb) * (one / _diag_row(f, nb=nb))
    return f, g, uinv


def _newton_inverses(f, *, nb, tol):
    """Exact Newton–Schulz doubling triangle inverses of a packed
    factor (MXU; log2(nb) interleaved matmul pairs).

    MEASURED (r3): fusing the two chains into ONE block-diagonal
    2nb-sized chain (half the sequential dot count, 4x the flops per
    dot) is SLOWER on v5e — rcm bench 12.0 -> 13.8 ms — i.e. these
    in-kernel dots are throughput-bound, not latency-bound.  Keep the
    two nb-sized chains interleaved."""
    dt = f.dtype
    tol = np.dtype(dt).type(tol)
    one = np.dtype(dt).type(1)
    two = np.dtype(dt).type(2)
    rows = lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    cols = lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    eye = jnp.where(rows == cols, jnp.ones((), dt), jnp.zeros((), dt))
    steps = max((nb - 1).bit_length() - 1, 0)

    dvec = jnp.sum(jnp.where(rows == cols, f, jnp.zeros((), dt)),
                   axis=0, keepdims=True)      # (1, nb) diagonal
    dsafe = jnp.where(jnp.abs(dvec) < tol, jnp.asarray(tol, dt), dvec)
    dinv_row = one / dsafe                     # (1, nb)
    lmat = jnp.where(rows > cols, f, jnp.zeros((), dt)) + eye
    umat = (jnp.where(rows < cols, f, jnp.zeros((), dt))
            * dinv_row.T) + eye                # I + D^-1 R

    # Mosaic only lowers DEFAULT/HIGHEST dot precision — pin HIGHEST so
    # an ambient jax.default_matmul_precision("high") context (legal
    # for the XLA-level panel/Schur matmuls) can't leak into the kernel.
    _dot = functools.partial(jnp.dot, preferred_element_type=dt,
                             precision=lax.Precision.HIGHEST)

    # interleave the two (independent) doubling chains so the scheduler
    # can pipeline their MXU dots
    x = two * eye - lmat
    y = two * eye - umat

    def newton_both(_, carry):
        x, y = carry
        x = _dot(x, two * eye - _dot(lmat, x))
        y = _dot(y, two * eye - _dot(umat, y))
        return x, y

    linv, y = _fori_loop(0, steps, newton_both, (x, y))
    return linv, y * dinv_row


def _getrf_inv_kernel(a_ref, f_ref, linv_ref, uinv_ref, *, nb, tol,
                      inv):
    f, linv, uinv = _lu_inverses(a_ref[:, :], nb=nb, tol=tol, inv=inv)
    f_ref[:, :] = f
    linv_ref[:, :] = linv
    uinv_ref[:, :] = uinv


def _inv_mode(inv):
    """Resolve the triangle-inverse scheme: explicit arg wins, else the
    PANGULU_MEGA_INV env A/B knob (read at TRACE time — flip it only in
    a fresh process, jit caches key on the resolved value only when
    passed explicitly)."""
    if inv is None:
        import os
        # default: diminishing row-window scan + Newton inverses —
        # bit-exact vs the plain scan, measured 11.63 -> 10.99 ms on
        # the bench problem (r4, tools/exp_blocked_scan.py)
        inv = os.environ.get("PANGULU_MEGA_INV", "sliced16")
    if inv not in ("scan", "newton", "newton2", "scanonly", "skip",
                   "blocked", "blocked8", "blocked16", "blocked32",
                   "sliced", "sliced4", "sliced8", "sliced16"):
        raise ValueError(f"unknown inverse mode {inv!r}")
    # "scanonly"/"skip" are DEBUG TIMING modes (tools/exp_mega_phases):
    # they return invalid inverses/factors and must never auto-dispatch
    return inv


@x32_trace
@functools.partial(jax.jit, static_argnames=("tol", "inv"))
def getrf_with_inverses(a, tol=None, inv=None):
    """Fused diagonal step as one Pallas kernel: (f, L^-1, U^-1)."""
    nb = a.shape[-1]
    dt = a.dtype
    if tol is None:
        tol = float(kj.DEFAULT_TOL[jnp.dtype(dt)])
    out = pl.pallas_call(
        functools.partial(_getrf_inv_kernel, nb=nb, tol=tol,
                          inv=_inv_mode(inv)),
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


# ---------------------------------------------------------------------------
# Whole-factorization mega-kernel
# ---------------------------------------------------------------------------
#
# Measured on the bench problem (poisson3d(32), nb=128, 256 levels), a
# per-level pallas_call costs ~124 us of pure launch overhead — 83% of
# the factorization wall time.  The mega-kernel eliminates it: ONE
# pallas_call runs the whole elimination loop.  Tiles stay in HBM; per
# level the kernel manually DMAs the diagonal tile, the L/U panel tiles
# and the Schur destination tiles through VMEM, computes LU + triangle
# inverses + panel solves + batched Schur updates in-core, and DMAs
# results back.  Per-level task counts come from SMEM-prefetched tables
# so only real work issues DMAs (the reference's per-task dynamism,
# recovered inside a single static kernel).

_UCH = 64   # default Schur-update chunk at nb=128 (dstbuf = 4 MB)


def mega_uch(nb: int) -> int:
    """Schur-update chunk size by tile size: bounds dstbuf VMEM to
    ~4 MB (64 tiles at nb=128, 16 at nb=256)."""
    return _UCH if nb <= 128 else max(4 * 1024 * 1024 // (nb * nb * 4), 8)


def _mega_kernel(diag_tab, nl_tab, nu_tab, nup_tab, flag_tab, lev_tab,
                 comb_hbm,
                 udst_hbm, udl_hbm, udu_hbm, tiles_in, tiles_out,
                 invs_out,
                 fbuf, linv_b, uinv_b, fbuf2, linv2, uinv2,
                 lpan, upan, prodrow, dstbuf,
                 comb_s, udst_c, udl_c, udu_c,
                 sem_diag, sem_inv, sem_cdiag, sem_cinv,
                 sem_l, sem_u, sem_lo, sem_uo, sem_di,
                 sem_do, sem_tab, sem_utab, *, nb, tol, bl, pch, uch,
                 comb_lw, comb_uw, comb_rw, inv, superlevel):
    """One elimination level per fori iteration; panels processed in
    chunks of ``pch`` tiles so arbitrarily wide levels (irregular
    orderings) run in bounded VMEM.  Schur updates are sorted by
    (u-chunk, l-chunk, l), so the U chunk / L chunk / L-row product are
    each re-formed only when the corresponding key changes.

    SUPER-LEVEL pipelining: levels arrive in dependency-depth order
    (host-permuted tables); ``flag_tab[k] = 1`` marks a level whose
    diagonal is INDEPENDENT of level k-1 (same super-level — no update
    of k-1 touches it; Schedule.block_depths).  Such a level's diag
    chain runs AHEAD, interleaved into level k-1's Schur stream: its
    tile is DMA'd at k-1's start, its rank-1 scan advances one step per
    Schur dot, and its Newton inverses complete right after the stream
    — the static-schedule counterpart of the reference's concurrent
    ready-GETRF seeding (pangulu_numeric.c:1054-1068).
    ``lev_tab[k]`` maps position -> original level id (inverse store
    indexing for the solve kernel).

    MEASURED OUTCOME on v5e (r3): in microbenchmarks a VPU scan step
    adjacent to an MXU dot in a tiny loop body overlaps ~perfectly,
    but inside this kernel's branchy update stream the Mosaic
    scheduler does NOT overlap them — interleaved chains serialize and
    add ~5 us each (smallworld(90): 5.66 -> 5.92 ms).  Auto-dispatch
    therefore leaves flag_tab zero; set PANGULU_TPU_SUPERLEVEL=1 to
    re-evaluate (e.g. on newer TPU generations)."""
    dt = tiles_out.dtype
    hi = lax.Precision.HIGHEST
    i32 = jnp.int32

    # Index-table rows stream HBM -> SMEM double-buffered: level k's
    # panel-id row AND its first Schur-update chunk rows (all fused
    # into ONE combined row — five separate per-level DMAs measured
    # ~3-4 us/level of pure start/wait overhead) were prefetched during
    # level k-1, so table fetches never sit on the critical path (the
    # full tables exceed SMEM for large bl).
    lid_w = comb_lw
    uid_w = comb_uw
    row_w = comb_rw
    o_uid = lid_w
    o_udst = lid_w + uid_w
    o_udl = o_udst + row_w
    o_udu = o_udl + row_w
    comb_pad = -(-(lid_w + uid_w + 3 * row_w) // 1024) * 1024

    def _row_copy(k, sl):
        # comb_s is kept 1D: 2D SMEM buffers get a (2,128) tiled
        # layout whose single-row slices Mosaic rejects; 1D offsets
        # sl*comb_pad are tile-aligned (comb_pad is a 1024-multiple)
        return pltpu.make_async_copy(
            comb_hbm.at[pl.ds(k * i32(comb_pad), comb_pad)],
            comb_s.at[pl.ds(sl * i32(comb_pad), comb_pad)],
            sem_tab.at[sl])

    _row_copy(0, 0).start()
    # prologue diag prefetch (subsequent levels prefetch at the barrier)
    pltpu.make_async_copy(tiles_out.at[diag_tab[0]], fbuf,
                          sem_diag.at[0]).start()

    def level(k, carry):
        dix = diag_tab[k]
        nl = nl_tab[k]
        nu = nu_tab[k]
        nup = nup_tab[k]
        sl = lax.rem(jnp.asarray(k, i32), i32(2))
        _row_copy(k, sl).wait()
        nxt = jnp.minimum(k + 1, i32(bl - 1))
        _row_copy(nxt, 1 - sl).start()
        # scalar accessors into the fused comb row (a compound SMEM
        # slice ref is NOT sliceable on dim 0 in Mosaic — read scalars
        # by offset instead); update-table rows for chunks > 0 live in
        # the dedicated 1D buffers
        cbase = sl * i32(comb_pad)

        class _CombRow:
            def __init__(self, off):
                self.off = off

            def __getitem__(self, j):
                return comb_s[cbase + self.off + j]

        lid_row = _CombRow(0)
        uid_row = _CombRow(o_uid)

        def _urow(off, cbuf, c, j):
            return jnp.where(c == i32(0), comb_s[cbase + off + j],
                             cbuf[j])

        def udst_at(c, j):
            return _urow(o_udst, udst_c, c, j)

        def udl_at(c, j):
            return _urow(o_udl, udl_c, c, j)

        def udu_at(c, j):
            return _urow(o_udu, udu_c, c, j)

        # chain-ahead is a COMPILE-TIME variant (``superlevel``): the
        # default kernel trace carries none of its branches (measured
        # no overlap on v5e — see the kernel docstring)
        ahead_self = (flag_tab[k] > 0 if superlevel
                      else jnp.asarray(False))
        # run level k+1's chain ahead, inside THIS level's Schur stream
        do_ahead = (jnp.logical_and(k + 1 < i32(bl), flag_tab[nxt] > 0)
                    if superlevel else jnp.asarray(False))
        dix_n = diag_tab[nxt]

        if superlevel:
            # chain-ahead epilogue for THIS level: wait the writebacks
            # started during level k-1 (frees fbuf2/linv2/uinv2 for the
            # next ahead chain) and promote the inverses to current
            @pl.when(ahead_self)
            def _():
                pltpu.make_async_copy(fbuf2, tiles_out.at[dix],
                                      sem_cdiag.at[1]).wait()
                pltpu.make_async_copy(linv2, invs_out.at[lev_tab[k], 0],
                                      sem_cinv.at[0]).wait()
                pltpu.make_async_copy(uinv2, invs_out.at[lev_tab[k], 1],
                                      sem_cinv.at[1]).wait()
                linv_b[:, :] = linv2[:, :]
                uinv_b[:, :] = uinv2[:, :]

            # start the NEXT chain's diag DMA now: its tile receives no
            # update from this level (same super-level) and all earlier
            # levels' writebacks landed at the previous barrier
            @pl.when(do_ahead)
            def _():
                pltpu.make_async_copy(tiles_out.at[dix_n], fbuf2,
                                      sem_cdiag.at[0]).start()

        # ---- diagonal step (tile prefetched at the previous level's
        # barrier — its last update had landed there) -------------------
        cin = pltpu.make_async_copy(tiles_out.at[dix], fbuf,
                                    sem_diag.at[0])
        # hoist the FIRST Schur chunk's dst loads: dst tiles are
        # disjoint from this level's diag/panel tiles, so they stream in
        # under the diag DMA + LU + panel work
        _fori_loop(0, jnp.minimum(nup, i32(uch)),
                      lambda j, c: (pltpu.make_async_copy(
                          tiles_out.at[udst_at(i32(0), j)],
                          dstbuf.at[j], sem_di.at[j]).start(), c)[1], 0)
        # prefetch the FIRST panel chunks: they load while the diag DMA
        # and the LU + inverse compute run
        _fori_loop(0, jnp.minimum(nl, pch),
                      lambda i, c: (pltpu.make_async_copy(
                          tiles_out.at[lid_row[i]],
                          lpan.at[pl.ds(pl.multiple_of(i * nb, nb), nb), :],
                          sem_l.at[i]).start(), c)[1], 0)
        _fori_loop(0, jnp.minimum(nu, pch),
                      lambda i, c: (pltpu.make_async_copy(
                          tiles_out.at[uid_row[i]],
                          upan.at[:, pl.ds(pl.multiple_of(i * nb, nb), nb)],
                          sem_u.at[i]).start(), c)[1], 0)

        # in-body chain (levels whose chain did NOT run ahead); in the
        # default (non-superlevel) trace this is unconditional
        def _inbody_chain():
            cin.wait()
            f, li_m, ui_m = _lu_inverses(fbuf[:, :], nb=nb, tol=tol,
                                         inv=inv)
            fbuf[:, :] = f
            linv_b[:, :] = li_m
            uinv_b[:, :] = ui_m
            pltpu.make_async_copy(fbuf, tiles_out.at[dix],
                                  sem_diag.at[1]).start()
            # persist the triangle inverses: the solve mega-kernel
            # turns every SpTRSV into pure matmuls against these
            pltpu.make_async_copy(linv_b, invs_out.at[lev_tab[k], 0],
                                  sem_inv.at[0]).start()
            pltpu.make_async_copy(uinv_b, invs_out.at[lev_tab[k], 1],
                                  sem_inv.at[1]).start()

        if superlevel:
            pl.when(jnp.logical_not(ahead_self))(_inbody_chain)
        else:
            _inbody_chain()

        # ---- panel solves, chunked ------------------------------------
        def _l_copy(i, base, outward):
            src = lpan.at[pl.ds(pl.multiple_of(i * nb, nb), nb), :]
            dst = tiles_out.at[lid_row[base + i]]
            sem = (sem_lo if outward else sem_l).at[i]
            return (pltpu.make_async_copy(src, dst, sem) if outward
                    else pltpu.make_async_copy(dst, src, sem))

        nlc = lax.div(nl + i32(pch - 1), i32(pch))
        nuc = lax.div(nu + i32(pch - 1), i32(pch))

        def l_chunk(lc, c):
            base = lc * pch
            cnt = jnp.minimum(nl - base, pch)

            @pl.when(lc > 0)  # chunk 0 inputs are already in flight
            def _():
                _fori_loop(0, cnt,
                              lambda i, c: (_l_copy(i, base, False).start(),
                                            c)[1], 0)

            _fori_loop(0, cnt,
                          lambda i, c: (_l_copy(i, base, False).wait(), c)[1], 0)
            # one flat matmul (garbage in padded rows never written back)
            lpan[:, :] = jnp.dot(lpan[:, :], uinv_b[:, :],
                                 preferred_element_type=dt, precision=hi)
            _fori_loop(0, cnt,
                          lambda i, c: (_l_copy(i, base, True).start(), c)[1], 0)

            # multi-chunk levels must land writebacks before the next
            # chunk reuses the buffer/semaphores and before Schur chunk
            # reloads read these tiles; single-chunk levels defer the
            # wait to the level barrier (overlaps the whole Schur phase)
            @pl.when(nlc > 1)
            def _():
                _fori_loop(0, cnt,
                              lambda i, c: (_l_copy(i, base, True).wait(),
                                            c)[1], 0)

            return c

        _fori_loop(0, nlc, l_chunk, 0)

        def _u_copy(i, base, outward):
            src = upan.at[:, pl.ds(pl.multiple_of(i * nb, nb), nb)]
            dst = tiles_out.at[uid_row[base + i]]
            sem = (sem_uo if outward else sem_u).at[i]
            return (pltpu.make_async_copy(src, dst, sem) if outward
                    else pltpu.make_async_copy(dst, src, sem))

        def u_chunk(uc, c):
            base = uc * pch
            cnt = jnp.minimum(nu - base, pch)

            @pl.when(uc > 0)  # chunk 0 inputs are already in flight
            def _():
                _fori_loop(0, cnt,
                              lambda i, c: (_u_copy(i, base, False).start(),
                                            c)[1], 0)

            _fori_loop(0, cnt,
                          lambda i, c: (_u_copy(i, base, False).wait(), c)[1], 0)
            upan[:, :] = jnp.dot(linv_b[:, :], upan[:, :],
                                 preferred_element_type=dt, precision=hi)
            _fori_loop(0, cnt,
                          lambda i, c: (_u_copy(i, base, True).start(), c)[1], 0)

            @pl.when(nuc > 1)
            def _():
                _fori_loop(0, cnt,
                              lambda i, c: (_u_copy(i, base, True).wait(),
                                            c)[1], 0)

            return c

        _fori_loop(0, nuc, u_chunk, 0)

        # ---- Schur updates, chunks of ``uch`` -------------------------
        # After phase 1 the LAST panel chunks are VMEM-resident; updates
        # are sorted by (u-chunk, l-chunk, l), and dst tiles are
        # disjoint from this level's diag/panel tiles and unique within
        # the level, so RMW traffic never races the panel writebacks.
        # The NEXT level's chain-ahead scan advances one step per
        # update dot inside this stream (VPU under MXU — near-free).
        if superlevel:
            @pl.when(do_ahead)
            def _():
                pltpu.make_async_copy(tiles_out.at[dix_n], fbuf2,
                                      sem_cdiag.at[0]).wait()

        cur0 = (jnp.maximum(nuc - 1, 0), jnp.maximum(nlc - 1, 0),
                i32(-1), i32(0))

        def chunk(c, cur):
            base = c * uch
            cnt = jnp.minimum(nup - base, uch)

            @pl.when(c > 0)  # chunk 0 rows/dsts prefetched at level start
            def _():
                for tab, dst_s, slot in ((udst_hbm, udst_c, 0),
                                         (udl_hbm, udl_c, 1),
                                         (udu_hbm, udu_c, 2)):
                    pltpu.make_async_copy(tab.at[k, c], dst_s,
                                          sem_utab.at[slot]).start()
                for tab, dst_s, slot in ((udst_hbm, udst_c, 0),
                                         (udl_hbm, udl_c, 1),
                                         (udu_hbm, udu_c, 2)):
                    pltpu.make_async_copy(tab.at[k, c], dst_s,
                                          sem_utab.at[slot]).wait()

                def d_in(j, cc):
                    pltpu.make_async_copy(tiles_out.at[udst_at(c, j)],
                                          dstbuf.at[j],
                                          sem_di.at[j]).start()
                    return cc

                _fori_loop(0, cnt, d_in, 0)

            def d_compute(j, cur):
                cur_uc, cur_lc, cur_l, sj = cur
                pltpu.make_async_copy(tiles_out.at[udst_at(c, j)],
                                      dstbuf.at[j], sem_di.at[j]).wait()
                li = udl_at(c, j)
                uj = udu_at(c, j)
                ucj = lax.div(uj, i32(pch))
                lcj = lax.div(li, i32(pch))
                uc_ch = ucj != cur_uc
                lc_ch = lcj != cur_lc

                @pl.when(uc_ch)
                def _():
                    # reload the solved U chunk from HBM
                    ub = ucj * pch
                    ucnt = jnp.minimum(nu - ub, pch)

                    def rin(i, c):
                        pltpu.make_async_copy(
                            tiles_out.at[uid_row[ub + i]],
                            upan.at[:, pl.ds(pl.multiple_of(i * nb, nb),
                                             nb)],
                            sem_u.at[i]).start()
                        return c

                    _fori_loop(0, ucnt, rin, 0)

                    def rwait(i, c):
                        pltpu.make_async_copy(
                            tiles_out.at[uid_row[ub + i]],
                            upan.at[:, pl.ds(pl.multiple_of(i * nb, nb),
                                             nb)],
                            sem_u.at[i]).wait()
                        return c

                    _fori_loop(0, ucnt, rwait, 0)

                @pl.when(lc_ch)
                def _():
                    lb = lcj * pch
                    lcnt = jnp.minimum(nl - lb, pch)

                    def rin(i, c):
                        pltpu.make_async_copy(
                            tiles_out.at[lid_row[lb + i]],
                            lpan.at[pl.ds(pl.multiple_of(i * nb, nb),
                                          nb), :],
                            sem_l.at[i]).start()
                        return c

                    _fori_loop(0, lcnt, rin, 0)

                    def rwait(i, c):
                        pltpu.make_async_copy(
                            tiles_out.at[lid_row[lb + i]],
                            lpan.at[pl.ds(pl.multiple_of(i * nb, nb),
                                          nb), :],
                            sem_l.at[i]).wait()
                        return c

                    _fori_loop(0, lcnt, rwait, 0)

                recompute = (li != cur_l) | uc_ch | lc_ch
                # width of the resident U chunk actually populated
                ucnt_here = jnp.minimum(nu - ucj * pch, i32(pch))
                half = pch // 2
                lsl = pl.ds(pl.multiple_of((li - lcj * pch) * nb, nb), nb)
                full_pred = (recompute & (ucnt_here > half) if half >= 1
                             else recompute)

                if half >= 1:  # python guard: pch == 1 has no half branch
                    @pl.when(recompute & (ucnt_here <= half))
                    def _():
                        # narrow U chunk: half-width dot (saves ~40% of
                        # the row-product MXU time at typical fill)
                        prodrow[:, : half * nb] = jnp.dot(
                            lpan[lsl, :], upan[:, : half * nb],
                            preferred_element_type=dt, precision=hi)

                @pl.when(full_pred)
                def _():
                    # one MXU dot: this L block against the whole
                    # resident U chunk; consecutive updates sharing it
                    # reduce to VPU subtracts
                    prodrow[:, :] = jnp.dot(
                        lpan[lsl, :], upan[:, :],
                        preferred_element_type=dt, precision=hi)

                # the chain-ahead scan step sits BETWEEN the dot issue
                # and the dependent subtract: the VPU advances the next
                # level's scan while the MXU finishes the row product
                if superlevel:
                    @pl.when(do_ahead & (sj < i32(nb)))
                    def _():
                        fbuf2[:, :] = _lu_scan_step(fbuf2[:, :], sj,
                                                    nb=nb, tol=tol)

                usl = pl.ds(pl.multiple_of((uj - ucj * pch) * nb, nb), nb)
                dstbuf[j] = dstbuf[j] - prodrow[:, usl]
                pltpu.make_async_copy(dstbuf.at[j],
                                      tiles_out.at[udst_at(c, j)],
                                      sem_do.at[j]).start()
                return (ucj, lcj, li, sj + 1)

            cur = _fori_loop(0, cnt, d_compute, cur)

            # the LAST chunk's writeback waits defer to the level
            # barrier (they overlap the remaining level work); earlier
            # chunks must land before their buffer slots are reused
            @pl.when(c + 1 < nchunks)
            def _():
                def d_wait(j, cc):
                    pltpu.make_async_copy(dstbuf.at[j],
                                          tiles_out.at[udst_at(c, j)],
                                          sem_do.at[j]).wait()
                    return cc

                _fori_loop(0, cnt, d_wait, 0)

            return cur

        nchunks = lax.div(nup + i32(uch - 1), i32(uch))
        cur_end = _fori_loop(0, nchunks, chunk, cur0)
        sj_end = cur_end[3]

        # ---- chain-ahead completion ------------------------------------
        # finish the next level's scan (steps the update stream didn't
        # cover), finalize, Newton inverses, and start its writebacks —
        # waited at level k+1 (sem_cdiag[1]/sem_cinv)
        if superlevel:
            @pl.when(do_ahead)
            def _():
                # tail: VALUE-carried fori (per-step ref round trips
                # cost ~2x; leaf-ish levels with few updates leave most
                # of the scan to this tail)
                f2 = _fori_loop(
                    jnp.minimum(sj_end, i32(nb)), i32(nb),
                    lambda s, f: _lu_scan_step(f, s, nb=nb, tol=tol),
                    fbuf2[:, :])
                f2 = _lu_finalize(f2, nb=nb, tol=tol)
                fbuf2[:, :] = f2
                li2, ui2 = _newton_inverses(f2, nb=nb, tol=tol)
                linv2[:, :] = li2
                uinv2[:, :] = ui2
                pltpu.make_async_copy(fbuf2, tiles_out.at[dix_n],
                                      sem_cdiag.at[1]).start()
                pltpu.make_async_copy(linv2,
                                      invs_out.at[lev_tab[nxt], 0],
                                      sem_cinv.at[0]).start()
                pltpu.make_async_copy(uinv2,
                                      invs_out.at[lev_tab[nxt], 1],
                                      sem_cinv.at[1]).start()

        # ---- level barrier ---------------------------------------------
        def _barrier():
            pltpu.make_async_copy(fbuf, tiles_out.at[dix],
                                  sem_diag.at[1]).wait()
            pltpu.make_async_copy(linv_b, invs_out.at[lev_tab[k], 0],
                                  sem_inv.at[0]).wait()
            pltpu.make_async_copy(uinv_b, invs_out.at[lev_tab[k], 1],
                                  sem_inv.at[1]).wait()

        if superlevel:
            pl.when(jnp.logical_not(ahead_self))(_barrier)
        else:
            _barrier()

        # last Schur chunk's dst writebacks deferred from the chunk loop
        @pl.when(nup > 0)
        def _():
            last = nup - (nchunks - 1) * i32(uch)
            c_last = jnp.maximum(nchunks - 1, i32(0))
            _fori_loop(0, last,
                          lambda j, c: (pltpu.make_async_copy(
                              dstbuf.at[j],
                              tiles_out.at[udst_at(c_last, j)],
                              sem_do.at[j]).wait(), c)[1], 0)

        # single-chunk panel writebacks deferred from phase 1
        @pl.when(nlc == 1)
        def _():
            _fori_loop(0, nl,
                          lambda i, c: (_l_copy(i, 0, True).wait(), c)[1], 0)

        @pl.when(nuc == 1)
        def _():
            _fori_loop(0, nu,
                          lambda i, c: (_u_copy(i, 0, True).wait(), c)[1], 0)

        # every write affecting diag(k+1) has landed: prefetch it now so
        # the next level's LU starts without a DMA wait (skipped when
        # the next level's chain ran AHEAD — its tile is already
        # consumed; mirrored in the post-loop drain)
        def _prefetch_next():
            pltpu.make_async_copy(tiles_out.at[diag_tab[nxt]],
                                  fbuf, sem_diag.at[0]).start()

        if superlevel:
            pl.when(flag_tab[nxt] == 0)(_prefetch_next)
        else:
            _prefetch_next()

        return carry

    _fori_loop(0, bl, level, 0)
    _row_copy(i32(bl - 1), lax.rem(i32(bl), i32(2))).wait()

    # drain the final diag prefetch (issued by the last barrier only
    # when the last level's chain did not run ahead)
    def _drain_last():
        pltpu.make_async_copy(tiles_out.at[diag_tab[bl - 1]], fbuf,
                              sem_diag.at[0]).wait()

    if superlevel:
        pl.when(flag_tab[bl - 1] == 0)(_drain_last)
    else:
        _drain_last()


# Panel chunk width: both the factorization and solve kernels stream
# panels through VMEM in chunks of at most this many tiles, so levels
# of ANY width run in bounded VMEM.
MEGA_MAX_PANEL = 32


@x32_trace
@functools.partial(jax.jit,
                   static_argnames=("nb", "tol", "bl", "pch", "uch",
                                    "inv"),
                   donate_argnums=(0,))
def mega_factorize(tiles, diag_tab, nl_tab, nu_tab, nup_tab,
                   lid_tab, uid_tab, udst_tab, udl_tab, udu_tab,
                   flag_tab=None, lev_tab=None,
                   *, nb, tol, bl, pch, uch=_UCH, inv=None):
    """Entire numeric factorization in ONE Pallas launch.

    tiles: [num_tiles+1, nb, nb] (donated; factored in place).
    Tables (host-precomputed from the level schedule, see
    Schedule.mega_tables): diag/nl/nu/nup_tab [bl] int32; lid/uid_tab
    [bl, NL/NU] int32; udst/udl/udu_tab [bl, nchunks, 128] int32 with
    the first ``uch`` lanes of each row holding one update chunk
    (``uch`` also sizes the dstbuf VMEM: uch * nb^2 * 4B — 64 at
    nb=128, smaller for nb=256).

    SUPER-LEVEL mode (Schedule.mega_tables(order=...)): tables arrive
    permuted into dependency-depth order; ``flag_tab[k] = 1`` marks a
    level independent of its predecessor, whose diag chain runs AHEAD
    interleaved in the predecessor's Schur stream; ``lev_tab`` maps
    position -> original level (inverse-store indexing).  With both
    None the kernel behaves exactly as before (every chain in-body).
    """
    dt = tiles.dtype
    # COMPILE-TIME variant selection: chain-ahead machinery only traces
    # into the kernel when super-level tables are supplied (the default
    # hot kernel carries no disabled-feature branches; the None-vs-array
    # pytree structure keys the jit cache)
    superlevel = flag_tab is not None
    if flag_tab is None:
        flag_tab = jnp.zeros(bl, jnp.int32)
    if lev_tab is None:
        lev_tab = jnp.arange(bl, dtype=jnp.int32)
    row_w = udst_tab.shape[-1]
    lid_w = lid_tab.shape[-1]
    uid_w = uid_tab.shape[-1]
    # ONE combined per-level index row (panel ids + first update
    # chunk): a single SMEM DMA per level instead of five.  Kept 1D —
    # a 2D i32 array gets an (8,128)-tiled layout whose single-row
    # slices Mosaic rejects; 1D rows slice at lane-aligned offsets
    # (comb_w is a multiple of 128 by construction of the widths).
    comb_w = lid_w + uid_w + 3 * row_w
    comb_pad = -(-comb_w // 1024) * 1024   # 1D i32 tiling is 1024
    comb_tab = jnp.concatenate(
        [lid_tab, uid_tab, udst_tab[:, 0], udl_tab[:, 0],
         udu_tab[:, 0],
         jnp.zeros((lid_tab.shape[0], comb_pad - comb_w), jnp.int32)],
        axis=1).reshape(-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(1,),
        in_specs=[
            # the comb table MUST live in HBM: it is a jit-internal
            # concatenate, and an ANY placement may pick VMEM, where
            # single-row i32 slices break the (8,128) tiling rule
            pl.BlockSpec(memory_space=pltpu.HBM),   # comb_tab
            pl.BlockSpec(memory_space=pltpu.ANY),   # udst_tab
            pl.BlockSpec(memory_space=pltpu.ANY),   # udl_tab
            pl.BlockSpec(memory_space=pltpu.ANY),   # udu_tab
            pl.BlockSpec(memory_space=pltpu.ANY),   # tiles
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)),
        scratch_shapes=[
            pltpu.VMEM((nb, nb), dt),               # fbuf
            pltpu.VMEM((nb, nb), dt),               # linv
            pltpu.VMEM((nb, nb), dt),               # uinv
            pltpu.VMEM((nb, nb), dt),               # fbuf2 (chain-ahead)
            pltpu.VMEM((nb, nb), dt),               # linv2
            pltpu.VMEM((nb, nb), dt),               # uinv2
            pltpu.VMEM((pch * nb, nb), dt),         # lpan (chunk)
            pltpu.VMEM((nb, pch * nb), dt),         # upan (column chunk)
            pltpu.VMEM((nb, pch * nb), dt),         # prodrow
            pltpu.VMEM((uch, nb, nb), dt),          # dstbuf
            pltpu.SMEM((2 * comb_pad,), jnp.int32),  # comb_s (double buf)
            pltpu.SMEM((row_w,), jnp.int32),        # udst_c (chunks > 0)
            pltpu.SMEM((row_w,), jnp.int32),        # udl_c
            pltpu.SMEM((row_w,), jnp.int32),        # udu_c
            pltpu.SemaphoreType.DMA((2,)),          # sem_diag
            pltpu.SemaphoreType.DMA((2,)),          # sem_inv
            pltpu.SemaphoreType.DMA((2,)),          # sem_cdiag (ahead)
            pltpu.SemaphoreType.DMA((2,)),          # sem_cinv (ahead)
            pltpu.SemaphoreType.DMA((pch,)),        # sem_l
            pltpu.SemaphoreType.DMA((pch,)),        # sem_u
            pltpu.SemaphoreType.DMA((pch,)),        # sem_lo
            pltpu.SemaphoreType.DMA((pch,)),        # sem_uo
            pltpu.SemaphoreType.DMA((uch,)),        # sem_di
            pltpu.SemaphoreType.DMA((uch,)),        # sem_do
            pltpu.SemaphoreType.DMA((2,)),          # sem_tab (comb row)
            pltpu.SemaphoreType.DMA((3,)),          # sem_utab
        ],
    )
    return pl.pallas_call(
        functools.partial(_mega_kernel, nb=nb, tol=tol, bl=bl,
                          pch=pch, uch=uch, comb_lw=lid_w,
                          comb_uw=uid_w, comb_rw=row_w,
                          inv=_inv_mode(inv), superlevel=superlevel),
        out_shape=(jax.ShapeDtypeStruct(tiles.shape, dt),
                   jax.ShapeDtypeStruct((bl, 2, nb, nb), dt)),
        grid_spec=grid_spec,
        input_output_aliases={10: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            # scratch exceeds the 16MB default scoped-vmem cap for wide
            # panel chunks; the chip has much more
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(diag_tab, nl_tab, nu_tab, nup_tab,
      jnp.asarray(flag_tab, jnp.int32), jnp.asarray(lev_tab, jnp.int32),
      comb_tab, udst_tab, udl_tab, udu_tab, tiles)


# ---------------------------------------------------------------------------
# Batched-group mega-kernel (super-levels)
# ---------------------------------------------------------------------------
#
# The chain kernel above pays ~35 us of serial per-level cost (scan
# latency + Newton + DMA waits + barrier) for EVERY elimination level —
# 76% of the bench kernel's wall time (tools/exp_mega_phases.py).  A
# nested-dissection schedule has many mutually independent columns at
# equal dependency depth (Schedule.superlevels): this kernel processes
# one GROUP of G <= gmax such columns per iteration — their G diagonal
# LUs advance as ONE batched 3D rank-1 scan (the per-step masks
# broadcast over the member axis), inverses and panel solves run
# per-member back-to-back, and the group's Schur updates form one
# stream.  The per-group fixed cost replaces G per-level fixed costs.
# Static-schedule counterpart of the reference's concurrent ready-GETRF
# seeding (pangulu_numeric.c:1054-1068).
#
# Updates from different members may hit the same destination tile
# (their Schur contributions commute).  Within a chunk they share one
# dstbuf slot: host tables pack slot (bits 20-27) + load-first (28) +
# write-last (29) flags into udl, so each dst is DMA'd once,
# accumulated in VMEM, and written once.


def _scan_step_3d(f, k, *, g, nb, tol):
    """One batched rank-1 elimination step over (g, nb, nb) — the 3D
    broadcast of :func:`_lu_scan_step` (member axis leading; masks and
    reductions act on the trailing two dims)."""
    dt = f.dtype
    tol = np.dtype(dt).type(tol)
    rows_f = lax.broadcasted_iota(jnp.int32, (g, nb, nb), 1)
    cols_f = lax.broadcasted_iota(jnp.int32, (g, nb, nb), 2)
    rowv = jnp.sum(jnp.where(rows_f == k, f, jnp.zeros((), dt)),
                   axis=1, keepdims=True)           # (g, 1, nb)
    colv = jnp.sum(jnp.where(cols_f == k, f, jnp.zeros((), dt)),
                   axis=2, keepdims=True)           # (g, nb, 1)
    piv = jnp.sum(jnp.where(
        lax.broadcasted_iota(jnp.int32, (g, 1, nb), 2) == k, rowv,
        jnp.zeros((), dt)), axis=2, keepdims=True)  # (g, 1, 1)
    safe = jnp.where(jnp.abs(piv) < tol, jnp.asarray(tol, dt), piv)
    below = lax.broadcasted_iota(jnp.int32, (g, nb, 1), 1) > k
    right = lax.broadcasted_iota(jnp.int32, (g, 1, nb), 2) > k
    lcol = jnp.where(below, colv / safe, jnp.zeros((), dt))
    urow = jnp.where(right, rowv, jnp.zeros((), dt))
    return f - lcol * urow


def _scan_step_3d_aug(c, k, *, g, nb, tol):
    """Batched :func:`_lu_scan_step_aug` over (g, nb, nb): one rank-1
    elimination step PLUS Gauss–Jordan accumulation of L^-1 (``gi``)
    and Utilde^-T (``v``) for all group members at once."""
    f, gi, v, dinvc = c
    dt = f.dtype
    tol = np.dtype(dt).type(tol)
    one = np.dtype(dt).type(1)
    rows_f = lax.broadcasted_iota(jnp.int32, (g, nb, nb), 1)
    cols_f = lax.broadcasted_iota(jnp.int32, (g, nb, nb), 2)
    rowv = jnp.sum(jnp.where(rows_f == k, f, jnp.zeros((), dt)),
                   axis=1, keepdims=True)           # (g, 1, nb)
    colv = jnp.sum(jnp.where(cols_f == k, f, jnp.zeros((), dt)),
                   axis=2, keepdims=True)           # (g, nb, 1)
    piv = jnp.sum(jnp.where(
        lax.broadcasted_iota(jnp.int32, (g, 1, nb), 2) == k, rowv,
        jnp.zeros((), dt)), axis=2, keepdims=True)  # (g, 1, 1)
    safe = jnp.where(jnp.abs(piv) < tol, jnp.asarray(tol, dt), piv)
    rows_c = lax.broadcasted_iota(jnp.int32, (g, nb, 1), 1)
    below = rows_c > k
    right = lax.broadcasted_iota(jnp.int32, (g, 1, nb), 2) > k
    lcol = jnp.where(below, colv / safe, jnp.zeros((), dt))
    urow = jnp.where(right, rowv, jnp.zeros((), dt))
    f = f - lcol * urow
    gk = jnp.sum(jnp.where(rows_f == k, gi, jnp.zeros((), dt)),
                 axis=1, keepdims=True)             # (g, 1, nb)
    gi = gi - lcol * gk
    dinvc = jnp.where(rows_c == k, one / safe, dinvc)  # (g, nb, 1)
    mk = jnp.where(rows_c < k, colv * dinvc, jnp.zeros((), dt))
    mv = jnp.sum(mk * v, axis=1, keepdims=True)     # (g, 1, nb)
    v = jnp.where(rows_f == k, v - mv, v)
    return f, gi, v, dinvc


def _lu_finalize_3d(f, *, g, nb, tol):
    """Batched :func:`_lu_finalize` over (g, nb, nb)."""
    dt = f.dtype
    tol = np.dtype(dt).type(tol)
    one = np.dtype(dt).type(1)
    rows_f = lax.broadcasted_iota(jnp.int32, (g, nb, nb), 1)
    cols_f = lax.broadcasted_iota(jnp.int32, (g, nb, nb), 2)
    lower_m = rows_f > cols_f
    dvec0 = jnp.sum(jnp.where(rows_f == cols_f, f, jnp.zeros((), dt)),
                    axis=1, keepdims=True)          # (g, 1, nb)
    dsafe0 = jnp.where(jnp.abs(dvec0) < tol, jnp.asarray(tol, dt),
                       dvec0)
    f = jnp.where(lower_m, f * (one / dsafe0), f)
    return jnp.where(rows_f == cols_f, dsafe0, f)


def _group_kernel(gs_tab, nup_tab,
                  comb_hbm, udst_hbm, udl_hbm, udu_hbm,
                  tiles_in, tiles_out, invs_out,
                  fb3, linv3, uinv3, lpan, upan, lraw, uraw,
                  prodrow, dstbuf,
                  comb_s, udst_c, udl_c, udu_c,
                  sem_diag, sem_dio, sem_inv,
                  sem_l, sem_u, sem_lo, sem_uo, sem_di, sem_do,
                  sem_tab, sem_utab,
                  *, nb, tol, ng, gmax, pch, uch,
                  comb_lw, comb_uw, comb_rw, inv):
    """One super-level GROUP per fori iteration; see the section
    comment above for the design and hazard rules.  Correctness rests
    on: (1) group diag/panel tiles are pairwise disjoint and disjoint
    from the group's update destinations (members are same-depth, so
    no member column depends on another); (2) same-dst updates share a
    dstbuf slot within a chunk and chunks are ordered by the
    end-of-chunk writeback waits; (3) everything a later group reads
    lands at the group barrier."""
    dt = tiles_out.dtype
    hi = lax.Precision.HIGHEST
    i32 = jnp.int32
    from pangulu_tpu.schedule import prodrow_tiers
    tiers = prodrow_tiers(pch)

    lid_w = comb_lw
    uid_w = comb_uw
    row_w = comb_rw
    o_uid = lid_w
    o_gdiag = o_uid + uid_w
    o_glev = o_gdiag + gmax
    o_gloff = o_glev + gmax
    o_guoff = o_gloff + (gmax + 1)
    o_udst = o_guoff + (gmax + 1)
    o_udl = o_udst + row_w
    o_udu = o_udl + row_w
    comb_pad = -(-(o_udu + row_w) // 1024) * 1024

    def _row_copy(g, sl):
        return pltpu.make_async_copy(
            comb_hbm.at[pl.ds(g * i32(comb_pad), comb_pad)],
            comb_s.at[pl.ds(sl * i32(comb_pad), comb_pad)],
            sem_tab.at[sl])

    # prologue: fetch group 0's row NOW (its diag ids are needed before
    # the loop to start the first diag DMAs)
    _row_copy(0, 0).start()
    _row_copy(0, 0).wait()

    def _diag_prefetch(sl, cnt):
        """Start diag DMAs for the group whose row is in slot ``sl``."""
        base = sl * i32(comb_pad) + i32(o_gdiag)

        def d(m, c):
            pltpu.make_async_copy(tiles_out.at[comb_s[base + m]],
                                  fb3.at[m], sem_diag.at[m]).start()
            return c

        _fori_loop(0, cnt, d, 0)

    _diag_prefetch(0, gs_tab[0])

    def group(g, carry):
        gs = gs_tab[g]
        nup = nup_tab[g]
        sl = lax.rem(jnp.asarray(g, i32), i32(2))
        nxt = jnp.minimum(g + 1, i32(ng - 1))

        @pl.when(g + 1 < i32(ng))
        def _():
            _row_copy(nxt, 1 - sl).start()

        cbase = sl * i32(comb_pad)

        class _Row:
            def __init__(self, off):
                self.off = off

            def __getitem__(self, j):
                return comb_s[cbase + self.off + j]

        lid_row = _Row(0)
        uid_row = _Row(o_uid)
        gdiag = _Row(o_gdiag)
        glev = _Row(o_glev)
        gloff = _Row(o_gloff)
        guoff = _Row(o_guoff)
        nl_tot = gloff[gmax]     # total L panels of the group
        nu_tot = guoff[gmax]
        # SINGLE-CHUNK fast path: all concatenated panels fit one pch
        # chunk (guaranteed by the table builder's panel budget for
        # multi-member groups; only oversized singleton levels miss).
        # Raw panels prefetch NOW — they overlap the batched diag scan
        # — get solved in place by one pow2-width dot per member, and
        # stay VMEM-resident for the whole Schur stream (no reloads).
        single = jnp.logical_and(nl_tot <= i32(pch),
                                 nu_tot <= i32(pch))

        def _raw_copy(i, is_l):
            if is_l:
                return pltpu.make_async_copy(
                    tiles_out.at[lid_row[i]],
                    lraw.at[pl.ds(pl.multiple_of(i * nb, nb), nb), :],
                    sem_l.at[i])
            return pltpu.make_async_copy(
                tiles_out.at[uid_row[i]],
                uraw.at[:, pl.ds(pl.multiple_of(i * nb, nb), nb)],
                sem_u.at[i])

        @pl.when(single)
        def _():
            _fori_loop(0, nl_tot, lambda i, c: (
                _raw_copy(i, True).start(), c)[1], 0)
            _fori_loop(0, nu_tot, lambda i, c: (
                _raw_copy(i, False).start(), c)[1], 0)

        def _urow(off, cbuf, c, j):
            return jnp.where(c == i32(0), comb_s[cbase + off + j],
                             cbuf[j])

        def udst_at(c, j):
            return _urow(o_udst, udst_c, c, j)

        def udl_at(c, j):
            return _urow(o_udl, udl_c, c, j)

        def udu_at(c, j):
            return _urow(o_udu, udu_c, c, j)

        def _unpack(v):
            li = lax.rem(v, i32(1 << 20))
            slot = lax.rem(lax.div(v, i32(1 << 20)), i32(256))
            doload = lax.rem(lax.div(v, i32(1 << 28)), i32(2))
            dowrite = lax.div(v, i32(1 << 29))
            return li, slot, doload, dowrite

        # chunk-0 dst prefetch: flagged first-occurrences only (slot-
        # shared duplicates reuse the loaded tile)
        def d_in0(j, c):
            _, slot, doload, _ = _unpack(udl_at(i32(0), j))

            @pl.when(doload > 0)
            def _():
                pltpu.make_async_copy(tiles_out.at[udst_at(i32(0), j)],
                                      dstbuf.at[slot],
                                      sem_di.at[slot]).start()

            return c

        _fori_loop(0, jnp.minimum(nup, i32(uch)), d_in0, 0)

        # ---- batched diagonal step ------------------------------------
        def d_wait(m, c):
            pltpu.make_async_copy(tiles_out.at[gdiag[m]], fb3.at[m],
                                  sem_diag.at[m]).wait()
            return c

        _fori_loop(0, gs, d_wait, 0)

        def _member_writebacks(m, c):
            pltpu.make_async_copy(fb3.at[m], tiles_out.at[gdiag[m]],
                                  sem_dio.at[m]).start()
            pltpu.make_async_copy(linv3.at[m],
                                  invs_out.at[glev[m], 0],
                                  sem_inv.at[m, 0]).start()
            pltpu.make_async_copy(uinv3.at[m],
                                  invs_out.at[glev[m], 1],
                                  sem_inv.at[m, 1]).start()
            return c

        if inv == "newton":
            f3 = _fori_loop(
                0, nb, lambda k, f: _scan_step_3d(f, k, g=gmax, nb=nb,
                                                  tol=tol),
                fb3[:, :, :])
            fb3[:, :, :] = _lu_finalize_3d(f3, g=gmax, nb=nb, tol=tol)

            # per-member Newton inverses + writebacks (independent
            # chains issued back-to-back so their MXU dots pipeline)
            def newton_m(m, c):
                li_m, ui_m = _newton_inverses(fb3[m], nb=nb, tol=tol)
                linv3[m] = li_m
                uinv3[m] = ui_m
                return _member_writebacks(m, c)

            _fori_loop(0, gs, newton_m, 0)
        else:
            # scan-resident inverses: ONE batched augmented scan
            # yields L^-1 directly and Utilde^-T; per member only the
            # MXU transpose-dot + D^-1 column scale remain (replaces
            # gs * 2*log2(nb) Newton dot pairs)
            eye3 = jnp.where(
                lax.broadcasted_iota(jnp.int32, (gmax, nb, nb), 1)
                == lax.broadcasted_iota(jnp.int32, (gmax, nb, nb), 2),
                jnp.ones((), dt), jnp.zeros((), dt))
            c0 = (fb3[:, :, :], eye3, eye3,
                  jnp.zeros((gmax, nb, 1), dt))
            f3, g3, v3, _ = _fori_loop(
                0, nb,
                lambda k, c: _scan_step_3d_aug(c, k, g=gmax, nb=nb,
                                               tol=tol), c0)
            fb3[:, :, :] = _lu_finalize_3d(f3, g=gmax, nb=nb, tol=tol)
            linv3[:, :, :] = g3
            uinv3[:, :, :] = v3
            one = np.dtype(dt).type(1)

            def fin_m(m, c):
                dinv_row = one / _diag_row(fb3[m], nb=nb)
                uinv3[m] = _transpose_dot(uinv3[m], nb=nb) * dinv_row
                return _member_writebacks(m, c)

            _fori_loop(0, gs, fin_m, 0)

        # ---- panel solves, per member, chunked ------------------------
        def _pan_copy(i, base, outward, is_l):
            if is_l:
                src = lpan.at[pl.ds(pl.multiple_of(i * nb, nb), nb), :]
                dst = tiles_out.at[lid_row[base + i]]
                sem = (sem_lo if outward else sem_l).at[i]
            else:
                src = upan.at[:, pl.ds(pl.multiple_of(i * nb, nb), nb)]
                dst = tiles_out.at[uid_row[base + i]]
                sem = (sem_uo if outward else sem_u).at[i]
            return (pltpu.make_async_copy(src, dst, sem) if outward
                    else pltpu.make_async_copy(dst, src, sem))

        def member_panels(m, c):
            l0 = gloff[m]
            nl_m = gloff[m + 1] - l0
            u0 = guoff[m]
            nu_m = guoff[m + 1] - u0
            nlc = lax.div(nl_m + i32(pch - 1), i32(pch))
            nuc = lax.div(nu_m + i32(pch - 1), i32(pch))

            def l_chunk(lc, c):
                base = l0 + lc * pch
                cnt = jnp.minimum(nl_m - lc * pch, pch)
                _fori_loop(0, cnt, lambda i, c: (
                    _pan_copy(i, base, False, True).start(), c)[1], 0)
                _fori_loop(0, cnt, lambda i, c: (
                    _pan_copy(i, base, False, True).wait(), c)[1], 0)
                lpan[: pch * nb, :] = jnp.dot(
                    lpan[: pch * nb, :], uinv3[m],
                    preferred_element_type=dt, precision=hi)
                _fori_loop(0, cnt, lambda i, c: (
                    _pan_copy(i, base, True, True).start(), c)[1], 0)
                # waits stay inline: the buffer is reused by the next
                # chunk/member and the update stream reloads from HBM
                _fori_loop(0, cnt, lambda i, c: (
                    _pan_copy(i, base, True, True).wait(), c)[1], 0)
                return c

            _fori_loop(0, nlc, l_chunk, 0)

            def u_chunk(uc, c):
                base = u0 + uc * pch
                cnt = jnp.minimum(nu_m - uc * pch, pch)
                _fori_loop(0, cnt, lambda i, c: (
                    _pan_copy(i, base, False, False).start(), c)[1], 0)
                _fori_loop(0, cnt, lambda i, c: (
                    _pan_copy(i, base, False, False).wait(), c)[1], 0)
                upan[:, : pch * nb] = jnp.dot(
                    linv3[m], upan[:, : pch * nb],
                    preferred_element_type=dt, precision=hi)
                _fori_loop(0, cnt, lambda i, c: (
                    _pan_copy(i, base, True, False).start(), c)[1], 0)
                _fori_loop(0, cnt, lambda i, c: (
                    _pan_copy(i, base, True, False).wait(), c)[1], 0)
                return c

            _fori_loop(0, nuc, u_chunk, 0)
            return c

        # fast path: wait the raw-panel prefetches, solve each member's
        # panels IN PLACE with ONE pow2-width dot (lpan/upan are padded
        # by pch extra tiles so a width-w window starting at l0 never
        # overruns; garbage rows it writes past the member's own panels
        # are overwritten by the next member's dot or land in the pad),
        # then start the factor writebacks (waited at the group
        # barrier).  Panels stay resident for the Schur stream.
        widths = []
        w = 1
        while w <= pch:
            widths.append(w)
            w *= 2

        @pl.when(single)
        def _():
            _fori_loop(0, nl_tot, lambda i, c: (
                _raw_copy(i, True).wait(), c)[1], 0)
            _fori_loop(0, nu_tot, lambda i, c: (
                _raw_copy(i, False).wait(), c)[1], 0)

            def solve_m(m, c):
                l0 = gloff[m]
                nl_m = gloff[m + 1] - l0
                u0 = guoff[m]
                nu_m = guoff[m + 1] - u0
                for w in widths:
                    lo_w = w // 2

                    @pl.when((nl_m > i32(lo_w)) & (nl_m <= i32(w)))
                    def _(w=w):
                        sl = pl.ds(pl.multiple_of(l0 * nb, nb), w * nb)
                        lpan[sl, :] = jnp.dot(
                            lraw[sl, :], uinv3[m],
                            preferred_element_type=dt, precision=hi)

                    @pl.when((nu_m > i32(lo_w)) & (nu_m <= i32(w)))
                    def _(w=w):
                        sl = pl.ds(pl.multiple_of(u0 * nb, nb), w * nb)
                        upan[:, sl] = jnp.dot(
                            linv3[m], uraw[:, sl],
                            preferred_element_type=dt, precision=hi)

                return c

            _fori_loop(0, gs, solve_m, 0)
            _fori_loop(0, nl_tot, lambda i, c: (
                _pan_copy(i, 0, True, True).start(), c)[1], 0)
            _fori_loop(0, nu_tot, lambda i, c: (
                _pan_copy(i, 0, True, False).start(), c)[1], 0)

        @pl.when(jnp.logical_not(single))
        def _():
            _fori_loop(0, gs, member_panels, 0)

        # ---- Schur updates, chunks of ``uch`` -------------------------
        # Single-chunk groups: solved panels are already VMEM-resident
        # (cur starts at chunk 0, no reloads).  Multi-chunk groups:
        # cur0 = -1 forces the first (uc, lc) reload.
        zm = jnp.where(single, i32(0), i32(-1))
        cur0 = (zm, zm, i32(-1))

        def chunk(c, cur):
            base = c * uch
            cnt = jnp.minimum(nup - base, uch)

            @pl.when(c > 0)
            def _():
                for tab, dst_s, slot in ((udst_hbm, udst_c, 0),
                                         (udl_hbm, udl_c, 1),
                                         (udu_hbm, udu_c, 2)):
                    pltpu.make_async_copy(tab.at[g, c], dst_s,
                                          sem_utab.at[slot]).start()
                for tab, dst_s, slot in ((udst_hbm, udst_c, 0),
                                         (udl_hbm, udl_c, 1),
                                         (udu_hbm, udu_c, 2)):
                    pltpu.make_async_copy(tab.at[g, c], dst_s,
                                          sem_utab.at[slot]).wait()

                def d_in(j, cc):
                    _, slot, doload, _ = _unpack(udl_at(c, j))

                    @pl.when(doload > 0)
                    def _():
                        pltpu.make_async_copy(
                            tiles_out.at[udst_at(c, j)],
                            dstbuf.at[slot], sem_di.at[slot]).start()

                    return cc

                _fori_loop(0, cnt, d_in, 0)

            def d_compute(j, cur):
                cur_uc, cur_lc, cur_l = cur
                li, slot, doload, dowrite = _unpack(udl_at(c, j))

                @pl.when(doload > 0)
                def _():
                    pltpu.make_async_copy(
                        tiles_out.at[udst_at(c, j)],
                        dstbuf.at[slot], sem_di.at[slot]).wait()

                # udu word: uj (bits 0-11) | window start u0c (12-18,
                # chunk-relative) | tier index (19-20).  The prodrow
                # spans only the member's u-window at the smallest
                # static tier width — see Schedule.group_mega_tables.
                uw = udu_at(c, j)
                uj = lax.rem(uw, i32(1 << 12))
                u0c = lax.rem(lax.div(uw, i32(1 << 12)), i32(1 << 7))
                ti = lax.div(uw, i32(1 << 19))
                ucj = lax.div(uj, i32(pch))
                lcj = lax.div(li, i32(pch))
                uc_ch = ucj != cur_uc
                lc_ch = lcj != cur_lc

                @pl.when(uc_ch)
                def _():
                    ub = ucj * pch
                    ucnt = jnp.minimum(nu_tot - ub, pch)
                    _fori_loop(0, ucnt, lambda i, cc: (
                        _pan_copy(i, ub, False, False).start(),
                        cc)[1], 0)
                    _fori_loop(0, ucnt, lambda i, cc: (
                        _pan_copy(i, ub, False, False).wait(),
                        cc)[1], 0)

                @pl.when(lc_ch)
                def _():
                    lb = lcj * pch
                    lcnt = jnp.minimum(nl_tot - lb, pch)
                    _fori_loop(0, lcnt, lambda i, cc: (
                        _pan_copy(i, lb, False, True).start(),
                        cc)[1], 0)
                    _fori_loop(0, lcnt, lambda i, cc: (
                        _pan_copy(i, lb, False, True).wait(),
                        cc)[1], 0)

                # within one l the window is fixed, so li-change
                # implies window-change; chunk reloads force recompute
                recompute = (li != cur_l) | uc_ch | lc_ch
                lsl = pl.ds(pl.multiple_of((li - lcj * pch) * nb, nb),
                            nb)
                for idx, w in enumerate(tiers):
                    @pl.when(recompute & (ti == i32(idx)))
                    def _(w=w):
                        prodrow[:, : w * nb] = jnp.dot(
                            lpan[lsl, :],
                            upan[:, pl.ds(pl.multiple_of(
                                u0c * nb, nb), w * nb)],
                            preferred_element_type=dt, precision=hi)

                usl = pl.ds(pl.multiple_of(
                    (uj - ucj * pch - u0c) * nb, nb), nb)
                dstbuf[slot] = dstbuf[slot] - prodrow[:, usl]

                @pl.when(dowrite > 0)
                def _():
                    pltpu.make_async_copy(dstbuf.at[slot],
                                          tiles_out.at[udst_at(c, j)],
                                          sem_do.at[slot]).start()

                return (ucj, lcj, li)

            cur = _fori_loop(0, cnt, d_compute, cur)

            # earlier chunks must land before their slots are reused;
            # the LAST chunk's waits defer to the group barrier
            @pl.when(c + 1 < nchunks)
            def _():
                def d_wait2(j, cc):
                    _, slot, _, dowrite = _unpack(udl_at(c, j))

                    @pl.when(dowrite > 0)
                    def _():
                        pltpu.make_async_copy(
                            dstbuf.at[slot],
                            tiles_out.at[udst_at(c, j)],
                            sem_do.at[slot]).wait()

                    return cc

                _fori_loop(0, cnt, d_wait2, 0)

            return cur

        nchunks = lax.div(nup + i32(uch - 1), i32(uch))
        _fori_loop(0, nchunks, chunk, cur0)

        # ---- group barrier --------------------------------------------
        def bar_m(m, c):
            pltpu.make_async_copy(fb3.at[m], tiles_out.at[gdiag[m]],
                                  sem_dio.at[m]).wait()
            pltpu.make_async_copy(linv3.at[m],
                                  invs_out.at[glev[m], 0],
                                  sem_inv.at[m, 0]).wait()
            pltpu.make_async_copy(uinv3.at[m],
                                  invs_out.at[glev[m], 1],
                                  sem_inv.at[m, 1]).wait()
            return c

        _fori_loop(0, gs, bar_m, 0)

        # fast-path factor writebacks must land before the next group
        # reads the tiles (and before lpan/upan slots are reused)
        @pl.when(single)
        def _():
            _fori_loop(0, nl_tot, lambda i, c: (
                _pan_copy(i, 0, True, True).wait(), c)[1], 0)
            _fori_loop(0, nu_tot, lambda i, c: (
                _pan_copy(i, 0, True, False).wait(), c)[1], 0)

        @pl.when(nup > 0)
        def _():
            c_last = jnp.maximum(nchunks - 1, i32(0))
            last = nup - c_last * i32(uch)

            def d_wait3(j, cc):
                _, slot, _, dowrite = _unpack(udl_at(c_last, j))

                @pl.when(dowrite > 0)
                def _():
                    pltpu.make_async_copy(
                        dstbuf.at[slot],
                        tiles_out.at[udst_at(c_last, j)],
                        sem_do.at[slot]).wait()

                return cc

            _fori_loop(0, last, d_wait3, 0)

        # next group's row has been in flight since body start: wait it
        # and start its diag DMAs (every write they read landed above)
        @pl.when(g + 1 < i32(ng))
        def _():
            _row_copy(nxt, 1 - sl).wait()
            _diag_prefetch(1 - sl, gs_tab[nxt])

        return carry

    _fori_loop(0, ng, group, 0)


@x32_trace
@functools.partial(jax.jit,
                   static_argnames=("nb", "tol", "ng", "gmax", "pch",
                                    "uch", "bl", "inv"),
                   donate_argnums=(0,))
def mega_factorize_groups(tiles, gs_tab, nup_tab, gdiag_tab, glev_tab,
                          gloff_tab, guoff_tab, lid_tab, uid_tab,
                          udst_tab, udl_tab, udu_tab,
                          *, nb, tol, ng, gmax, pch, uch, bl,
                          inv=None):
    """Entire numeric factorization in ONE Pallas launch, one BATCHED
    super-level group per loop iteration (see Schedule.group_mega_tables
    for the table format and the section comment for the design).

    tiles: [num_tiles+1, nb, nb] (donated; factored in place).
    Returns (tiles, invs[bl, 2, nb, nb]) — the inverse store is indexed
    by ORIGINAL level id (glev_tab), so the solve kernels work
    unchanged."""
    dt = tiles.dtype
    row_w = udst_tab.shape[-1]
    lid_w = lid_tab.shape[-1]
    uid_w = uid_tab.shape[-1]
    comb_w = lid_w + uid_w + 2 * gmax + 2 * (gmax + 1) + 3 * row_w
    comb_pad = -(-comb_w // 1024) * 1024
    comb_tab = jnp.concatenate(
        [lid_tab, uid_tab, gdiag_tab, glev_tab, gloff_tab, guoff_tab,
         udst_tab[:, 0], udl_tab[:, 0], udu_tab[:, 0],
         jnp.zeros((lid_tab.shape[0], comb_pad - comb_w), jnp.int32)],
        axis=1).reshape(-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # comb_tab
            pl.BlockSpec(memory_space=pltpu.ANY),   # udst_tab
            pl.BlockSpec(memory_space=pltpu.ANY),   # udl_tab
            pl.BlockSpec(memory_space=pltpu.ANY),   # udu_tab
            pl.BlockSpec(memory_space=pltpu.ANY),   # tiles
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)),
        scratch_shapes=[
            pltpu.VMEM((gmax, nb, nb), dt),         # fb3
            pltpu.VMEM((gmax, nb, nb), dt),         # linv3
            pltpu.VMEM((gmax, nb, nb), dt),         # uinv3
            # lpan/upan/lraw/uraw carry pch extra pad tiles: the fast
            # path's pow2-width member solves may read/write past the
            # member's own panels (never consumed — see _group_kernel)
            pltpu.VMEM((2 * pch * nb, nb), dt),     # lpan
            pltpu.VMEM((nb, 2 * pch * nb), dt),     # upan
            pltpu.VMEM((2 * pch * nb, nb), dt),     # lraw
            pltpu.VMEM((nb, 2 * pch * nb), dt),     # uraw
            pltpu.VMEM((nb, pch * nb), dt),         # prodrow
            pltpu.VMEM((uch, nb, nb), dt),          # dstbuf
            pltpu.SMEM((2 * comb_pad,), jnp.int32),  # comb_s
            pltpu.SMEM((row_w,), jnp.int32),        # udst_c
            pltpu.SMEM((row_w,), jnp.int32),        # udl_c
            pltpu.SMEM((row_w,), jnp.int32),        # udu_c
            pltpu.SemaphoreType.DMA((gmax,)),       # sem_diag (in)
            pltpu.SemaphoreType.DMA((gmax,)),       # sem_dio (out)
            pltpu.SemaphoreType.DMA((gmax, 2)),     # sem_inv
            pltpu.SemaphoreType.DMA((pch,)),        # sem_l
            pltpu.SemaphoreType.DMA((pch,)),        # sem_u
            pltpu.SemaphoreType.DMA((pch,)),        # sem_lo
            pltpu.SemaphoreType.DMA((pch,)),        # sem_uo
            pltpu.SemaphoreType.DMA((uch,)),        # sem_di
            pltpu.SemaphoreType.DMA((uch,)),        # sem_do
            pltpu.SemaphoreType.DMA((2,)),          # sem_tab
            pltpu.SemaphoreType.DMA((3,)),          # sem_utab
        ],
    )
    return pl.pallas_call(
        functools.partial(_group_kernel, nb=nb, tol=tol, ng=ng,
                          gmax=gmax, pch=pch, uch=uch,
                          comb_lw=lid_w, comb_uw=uid_w, comb_rw=row_w,
                          inv=_inv_mode(inv)),
        out_shape=(jax.ShapeDtypeStruct(tiles.shape, dt),
                   jax.ShapeDtypeStruct((bl, 2, nb, nb), dt)),
        grid_spec=grid_spec,
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(gs_tab, nup_tab, comb_tab, udst_tab, udl_tab, udu_tab, tiles)


# ---------------------------------------------------------------------------
# Whole-solve mega-kernel (SpTRSV)
# ---------------------------------------------------------------------------
#
# Counterpart of pangulu_sptrsv.c re-expressed for one core: the entire
# forward+backward blocked substitution in ONE pallas_call.  The
# solution vector lives in VMEM for the whole solve (layout
# [nrhs, bl+1, nb] so the lane dimension is nb); per level the kernel
# DMAs the level's triangle INVERSE (persisted by mega_factorize) and
# panel tiles from HBM, so every step is an MXU contraction — no
# in-kernel substitution loops at all.


def _mega_solve_kernel(nl_tab, nuc_tab, lid_hbm, lrow_hbm, ucid_hbm,
                       ucrow_hbm, tiles_hbm, invs_hbm, x_in, x_out,
                       invbuf, tbuf, id_s, row_s, sem_inv, sem_t, sem_tab,
                       *, nb, bl, npan, pchunk):
    dt = x_out.dtype
    hi = lax.Precision.HIGHEST
    i32 = jnp.int32
    x_out[:, :, :] = x_in[:, :, :]

    # Fully software-pipelined sweeps: at entry to level k, its index
    # rows, triangle inverse AND first panel CHUNK are already in
    # flight / landed.  Panels stream in chunks of ``pchunk`` tiles
    # through a ping-pong tbuf: the chunk sequence is global across
    # levels (each chunk's processing starts the NEXT chunk in the
    # stream — the next chunk of this level, or chunk 0 of the next
    # level), so arbitrarily wide panels run in bounded VMEM.
    def _rows(k, sl, id_hbm, row_hbm):
        return (
            pltpu.make_async_copy(id_hbm.at[k], id_s.at[sl],
                                  sem_tab.at[sl, 0]),
            pltpu.make_async_copy(row_hbm.at[k], row_s.at[sl],
                                  sem_tab.at[sl, 1]),
        )

    def _inv(k, sl, inv_slot):
        return pltpu.make_async_copy(invs_hbm.at[k, inv_slot],
                                     invbuf.at[sl], sem_inv.at[sl])

    def _tile(sl, i, tid):
        return pltpu.make_async_copy(tiles_hbm.at[tid],
                                     tbuf.at[sl, i], sem_t.at[sl, i])

    def _start_chunk(tb_sl, row_sl, base, cnt):
        _fori_loop(
            0, cnt,
            lambda t, c: (_tile(tb_sl, t,
                                id_s[row_sl, base + t]).start(), c)[1],
            0)

    def _sweep(nseg_tab, id_hbm, row_hbm, inv_slot, descending):
        def lvl(i):
            j = jnp.minimum(jnp.maximum(i, 0), i32(bl - 1))
            return jnp.asarray(bl - 1 - j if descending else j, i32)

        # prologue: rows(0)+inv(0) -> slot 0; rows(1)+inv(1) -> slot 1;
        # level 0's chunk 0 -> tbuf slot 0
        for c in _rows(lvl(0), 0, id_hbm, row_hbm):
            c.start()
        _inv(lvl(0), 0, inv_slot).start()
        for c in _rows(lvl(1), 1, id_hbm, row_hbm):
            c.start()
        _inv(lvl(1), 1, inv_slot).start()
        for c in _rows(lvl(0), 0, id_hbm, row_hbm):
            c.wait()
        _start_chunk(0, 0, 0,
                     jnp.minimum(nseg_tab[lvl(0)], i32(pchunk)))

        def body(i, par):
            row_sl = lax.rem(jnp.asarray(i, i32), i32(2))
            k = lvl(i)
            n = nseg_tab[k]
            _inv(k, row_sl, inv_slot).wait()
            xk = lax.dot_general(
                x_out[:, k, :], invbuf[row_sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=dt, precision=hi)
            x_out[:, k, :] = xk

            # level i+1's rows must have landed before any chunk start
            # can read its ids from SMEM
            kn = lvl(i + 1)
            for c in _rows(kn, 1 - row_sl, id_hbm, row_hbm):
                c.wait()
            nn = nseg_tab[kn]
            # >=1 chunk even at n == 0 so the stream always advances
            nch = jnp.maximum(
                lax.div(n + i32(pchunk - 1), i32(pchunk)), i32(1))

            def chunk_body(c, par):
                base = c * i32(pchunk)
                cnt = jnp.clip(n - base, 0, i32(pchunk))
                # start the NEXT chunk of the global stream
                is_last = c + 1 >= nch
                nbase = jnp.where(is_last, i32(0), base + i32(pchunk))
                nrow_sl = jnp.where(is_last, 1 - row_sl, row_sl)
                ncnt = jnp.clip(jnp.where(is_last, nn, n) - nbase,
                                0, i32(pchunk))
                _start_chunk(1 - par, nrow_sl, nbase, ncnt)

                def t_apply(t, cc):
                    _tile(par, t, id_s[row_sl, base + t]).wait()
                    upd = lax.dot_general(
                        xk, tbuf[par, t],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=dt, precision=hi)
                    r = row_s[row_sl, base + t]
                    x_out[:, r, :] = x_out[:, r, :] - upd
                    return cc

                _fori_loop(0, cnt, t_apply, 0)
                return 1 - par

            par = _fori_loop(0, nch, chunk_body, par)

            # rows+inv for level i+2 reuse row slot row_sl (now free)
            knn = lvl(i + 2)
            for c in _rows(knn, row_sl, id_hbm, row_hbm):
                c.start()
            _inv(knn, row_sl, inv_slot).start()
            return par

        par = _fori_loop(0, bl, body, i32(0))

        # drain (semaphore balance).  Start/wait ledger per sweep:
        #   rows:  starts = bl + 2 (prologue 2, one per body);
        #          waits  = bl + 1 -> ONE unwaited pair, slot (bl-1)%2
        #   inv:   starts = bl + 2; waits = bl -> TWO unwaited
        #   tiles: every chunk started is waited by its chunk_body,
        #          EXCEPT the final stream prefetch issued by
        #          body(bl-1)'s last chunk: (level lvl(bl)->lvl(bl-1),
        #          chunk 0), tbuf slot `par`, ids at row slot bl%2
        sl_last = lax.rem(i32(bl), i32(2))          # = 1 - (bl-1)%2
        for c in _rows(lvl(i32(bl - 1)), 1 - sl_last, id_hbm, row_hbm):
            c.wait()
        _inv(lvl(i32(bl - 1)), sl_last, inv_slot).wait()
        _inv(lvl(i32(bl - 1)), 1 - sl_last, inv_slot).wait()
        _fori_loop(
            0, jnp.minimum(nseg_tab[lvl(i32(bl - 1))], i32(pchunk)),
            lambda t, c: (_tile(par, t, id_s[sl_last, t]).wait(),
                          c)[1], 0)

    _sweep(nl_tab, lid_hbm, lrow_hbm, 0, False)    # forward (L)
    _sweep(nuc_tab, ucid_hbm, ucrow_hbm, 1, True)  # backward (U)


# VMEM budget gate for the in-VMEM solution vector (the kernel's other
# buffers are small; the Mosaic scoped-vmem cap is raised to 100MB).
MEGA_SOLVE_MAX_X_BYTES = 24 * 2 ** 20


@x32_trace
@functools.partial(jax.jit,
                   static_argnames=("nb", "bl", "npan"))
def mega_solve(x, tiles, invs, nl_tab, nuc_tab, lid_tab, lrow_tab,
               ucid_tab, ucrow_tab, *, nb, bl, npan):
    """Entire LUx = b solve in ONE Pallas launch.

    x: [nrhs, bl+1, nb] (the +1 segment absorbs padded panel rows);
    tiles: factored tile store; invs: [bl, 2, nb, nb] triangle inverses
    persisted by :func:`mega_factorize`.  Panels of ANY width stream in
    chunks of ``MEGA_MAX_PANEL`` tiles through bounded VMEM.  Returns
    the solved x.
    """
    dt = x.dtype
    pchunk = min(max(npan, 1), MEGA_MAX_PANEL)
    row_w = lid_tab.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # lid_tab
            pl.BlockSpec(memory_space=pltpu.ANY),    # lrow_tab
            pl.BlockSpec(memory_space=pltpu.ANY),    # ucid_tab
            pl.BlockSpec(memory_space=pltpu.ANY),    # ucrow_tab
            pl.BlockSpec(memory_space=pltpu.ANY),    # tiles
            pl.BlockSpec(memory_space=pltpu.ANY),    # invs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, nb, nb), dt),             # invbuf (double buf)
            pltpu.VMEM((2, pchunk, nb, nb), dt),     # tbuf (chunk x2)
            pltpu.SMEM((2, row_w), jnp.int32),       # id_s (double buf)
            pltpu.SMEM((2, row_w), jnp.int32),       # row_s (double buf)
            pltpu.SemaphoreType.DMA((2,)),           # sem_inv
            pltpu.SemaphoreType.DMA((2, pchunk)),    # sem_t
            pltpu.SemaphoreType.DMA((2, 2)),         # sem_tab
        ],
    )
    return pl.pallas_call(
        functools.partial(_mega_solve_kernel, nb=nb, bl=bl, npan=npan,
                          pchunk=pchunk),
        out_shape=jax.ShapeDtypeStruct(x.shape, dt),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            # scratch exceeds the 16MB default scoped-vmem cap for wide
            # panel chunks; the chip has much more
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(nl_tab, nuc_tab, lid_tab, lrow_tab, ucid_tab, ucrow_tab,
      tiles, invs, x)


def _mega_solve_groups_kernel(nl_tab, nuc_tab, kseg_tab, ltab_hbm,
                              uctab_hbm, tiles_hbm, invs_hbm, x_in,
                              x_out, invbuf, tbuf, xbuf, tab_s,
                              sem_inv, sem_t, sem_tab,
                              *, nb, bl, ngr, gmax, npan, pchunk):
    """Batched-group SpTRSV: one sweep iteration settles a whole
    super-level group — the G member contractions have no dependent
    chain between them (equal-depth columns share no tile), so their
    dots issue back-to-back, and the group's concatenated panels
    stream as one chunk sequence.  Same double-buffered pipeline and
    semaphore ledger as :func:`_mega_solve_kernel`, with levels
    replaced by groups and the per-level index rows packed into ONE
    [3, W] SMEM DMA (ids / x-rows / member selectors)."""
    dt = x_out.dtype
    hi = lax.Precision.HIGHEST
    i32 = jnp.int32
    x_out[:, :, :] = x_in[:, :, :]

    def _tab(g, sl, tab_hbm):
        return pltpu.make_async_copy(tab_hbm.at[g], tab_s.at[sl],
                                     sem_tab.at[sl])

    def _inv_copies(g, sl, inv_slot):
        out = []
        for m in range(gmax):
            k = jnp.minimum(kseg_tab[g, m], i32(bl - 1))
            out.append(pltpu.make_async_copy(invs_hbm.at[k, inv_slot],
                                             invbuf.at[sl, m],
                                             sem_inv.at[sl, m]))
        return out

    def _invs(g, sl, inv_slot):
        for c in _inv_copies(g, sl, inv_slot):
            c.start()

    def _wait_invs(g, sl, inv_slot):
        for c in _inv_copies(g, sl, inv_slot):
            c.wait()

    def _tile(sl, i, tid):
        return pltpu.make_async_copy(tiles_hbm.at[tid],
                                     tbuf.at[sl, i], sem_t.at[sl, i])

    def _start_chunk(tb_sl, row_sl, base, cnt):
        _fori_loop(
            0, cnt,
            lambda t, c: (_tile(tb_sl, t,
                                tab_s[row_sl, 0, base + t]).start(),
                          c)[1],
            0)

    def _sweep(nseg_tab, tab_hbm, inv_slot, descending):
        def grp(i):
            j = jnp.minimum(jnp.maximum(i, 0), i32(ngr - 1))
            return jnp.asarray(ngr - 1 - j if descending else j, i32)

        # prologue: tab+invs for groups 0/1 -> slots 0/1; group 0's
        # chunk 0 -> tbuf slot 0
        _tab(grp(0), 0, tab_hbm).start()
        _invs(grp(0), 0, inv_slot)
        _tab(grp(1), 1, tab_hbm).start()
        _invs(grp(1), 1, inv_slot)
        _tab(grp(0), 0, tab_hbm).wait()
        _start_chunk(0, 0, 0,
                     jnp.minimum(nseg_tab[grp(0)], i32(pchunk)))

        def body(i, par):
            row_sl = lax.rem(jnp.asarray(i, i32), i32(2))
            g = grp(i)
            n = nseg_tab[g]
            _wait_invs(g, row_sl, inv_slot)
            # member contractions: independent dots, no chain between
            # them (padding members read the scratch x segment and
            # write garbage back to it — never selected by real
            # panels)
            for m in range(gmax):
                k = kseg_tab[g, m]
                xk = lax.dot_general(
                    x_out[:, k, :], invbuf[row_sl, m],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=dt, precision=hi)
                x_out[:, k, :] = xk
                xbuf[m] = xk

            gn = grp(i + 1)
            _tab(gn, 1 - row_sl, tab_hbm).wait()
            nn = nseg_tab[gn]
            nch = jnp.maximum(
                lax.div(n + i32(pchunk - 1), i32(pchunk)), i32(1))

            def chunk_body(c, par):
                base = c * i32(pchunk)
                cnt = jnp.clip(n - base, 0, i32(pchunk))
                is_last = c + 1 >= nch
                nbase = jnp.where(is_last, i32(0), base + i32(pchunk))
                nrow_sl = jnp.where(is_last, 1 - row_sl, row_sl)
                ncnt = jnp.clip(jnp.where(is_last, nn, n) - nbase,
                                0, i32(pchunk))
                _start_chunk(1 - par, nrow_sl, nbase, ncnt)

                def t_apply(t, cc):
                    _tile(par, t, tab_s[row_sl, 0, base + t]).wait()
                    xm = xbuf[tab_s[row_sl, 2, base + t]]
                    upd = lax.dot_general(
                        xm, tbuf[par, t],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=dt, precision=hi)
                    r = tab_s[row_sl, 1, base + t]
                    x_out[:, r, :] = x_out[:, r, :] - upd
                    return cc

                _fori_loop(0, cnt, t_apply, 0)
                return 1 - par

            par = _fori_loop(0, nch, chunk_body, par)

            gnn = grp(i + 2)
            _tab(gnn, row_sl, tab_hbm).start()
            _invs(gnn, row_sl, inv_slot)
            return par

        par = _fori_loop(0, ngr, body, i32(0))

        # drain (same ledger as the per-level kernel, with ngr in
        # place of bl): ONE unwaited tab pair, TWO unwaited inv sets,
        # and the final stream prefetch's tiles.
        sl_last = lax.rem(i32(ngr), i32(2))
        _tab(grp(i32(ngr - 1)), 1 - sl_last, tab_hbm).wait()
        _wait_invs(grp(i32(ngr)), sl_last, inv_slot)
        _wait_invs(grp(i32(ngr + 1)), 1 - sl_last, inv_slot)
        _fori_loop(
            0, jnp.minimum(nseg_tab[grp(i32(ngr - 1))], i32(pchunk)),
            lambda t, c: (_tile(par, t, tab_s[sl_last, 0, t]).wait(),
                          c)[1], 0)

    _sweep(nl_tab, ltab_hbm, 0, False)     # forward (L)
    _sweep(nuc_tab, uctab_hbm, 1, True)    # backward (U)


@x32_trace
@functools.partial(jax.jit,
                   static_argnames=("nb", "bl", "ngr", "gmax", "npan"))
def mega_solve_groups(x, tiles, invs, nl_tab, nuc_tab, kseg_tab,
                      ltab, uctab, *, nb, bl, ngr, gmax, npan):
    """Entire LUx = b solve in ONE Pallas launch, batched over
    super-level groups (see :func:`_mega_solve_groups_kernel`)."""
    dt = x.dtype
    nrhs = x.shape[0]
    pchunk = min(max(npan, 1), MEGA_MAX_PANEL)
    row_w = ltab.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # ltab
            pl.BlockSpec(memory_space=pltpu.ANY),    # uctab
            pl.BlockSpec(memory_space=pltpu.ANY),    # tiles
            pl.BlockSpec(memory_space=pltpu.ANY),    # invs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, gmax, nb, nb), dt),       # invbuf
            pltpu.VMEM((2, pchunk, nb, nb), dt),     # tbuf
            pltpu.VMEM((gmax, nrhs, nb), dt),        # xbuf
            pltpu.SMEM((2, 3, row_w), jnp.int32),    # tab_s
            pltpu.SemaphoreType.DMA((2, gmax)),      # sem_inv
            pltpu.SemaphoreType.DMA((2, pchunk)),    # sem_t
            pltpu.SemaphoreType.DMA((2,)),           # sem_tab
        ],
    )
    return pl.pallas_call(
        functools.partial(_mega_solve_groups_kernel, nb=nb, bl=bl,
                          ngr=ngr, gmax=gmax, npan=npan,
                          pchunk=pchunk),
        out_shape=jax.ShapeDtypeStruct(x.shape, dt),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(nl_tab, nuc_tab, kseg_tab, ltab, uctab, tiles, invs, x)


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
        vecadd=kj.vecadd,
    )
