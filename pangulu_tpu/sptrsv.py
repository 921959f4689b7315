"""Blocked sparse triangular solves (SpTRSV) — the gstrs path.

Counterpart of ``pangulu_sptrsv.c``: level-by-level blocked forward
substitution on L (unit diagonal) then backward substitution on U, both
reading the factored tiles in place.  The reference's per-level
spmv-partial + MPI reduce + bcast (pangulu_sptrsv.c:24-174) becomes, on
a single chip, a batched tile x segment matmul with scatter-add — the
right-looking formulation: once segment k is solved, all dependent
segments are updated in one batched launch.

Multi-RHS is first-class: x is carried as ``[bl+1, nb, nrhs]`` (the +1
row is the scratch segment absorbing padded lanes), so factor-once /
solve-many amortizes like the reference's repeated gstrs calls
(README.md:125).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pangulu_tpu.blocks import BlockedMatrix
from pangulu_tpu.ops.interface import KernelBackend, get_backend
from pangulu_tpu.schedule import Schedule, bucket, pad_ids
from pangulu_tpu.utils import device_sync
from pangulu_tpu.utils.log import get_logger
from pangulu_tpu.utils.perf import PerfCounters

log = get_logger()


@functools.partial(jax.jit, static_argnums=(0, 4), donate_argnums=(2,))
def _seg_solve(backend: KernelBackend, tiles, x, args, lower: bool):
    """Fixed-shape per-level triangular solve of one x-segment
    (compiles once per direction/dtype/nrhs)."""
    diag_idx, k = args
    d = tiles[diag_idx[0]]
    xk = (backend.trsv_lower_unit(d, x[k[0]]) if lower
          else backend.trsv_upper(d, x[k[0]]))
    return x.at[k[0]].set(xk)


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def _seg_update(backend: KernelBackend, tiles, x, k, panel_ids, panel_rows):
    """x[rows] -= T(i,k) @ x[k] for the level's panel blocks (batched
    matmul, bucket-padded — cheap to compile)."""
    xk = x[k[0]]
    upd = jnp.matmul(tiles[panel_ids], xk, preferred_element_type=x.dtype)
    return x.at[panel_rows].add(-upd)


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def _fused_solve(backend: KernelBackend, tiles, x, diag_idx,
                 l_ids, l_rows, uc_ids, uc_rows):
    """Whole forward+backward solve in ONE dispatch (lax.fori_loop over
    levels) — the TPU fast path matching the fused factorize engine."""
    bl = diag_idx.shape[0]
    dt = x.dtype

    def fwd(k, x):
        xk = backend.trsv_lower_unit(tiles[diag_idx[k]], x[k])
        x = x.at[k].set(xk)
        upd = jnp.matmul(tiles[l_ids[k]], xk, preferred_element_type=dt)
        return x.at[l_rows[k]].add(-upd)

    def bwd(i, x):
        k = bl - 1 - i
        xk = backend.trsv_upper(tiles[diag_idx[k]], x[k])
        x = x.at[k].set(xk)
        upd = jnp.matmul(tiles[uc_ids[k]], xk, preferred_element_type=dt)
        return x.at[uc_rows[k]].add(-upd)

    x = jax.lax.fori_loop(0, bl, fwd, x)
    x = jax.lax.fori_loop(0, bl, bwd, x)
    return x


@functools.partial(jax.jit, donate_argnums=(2,))
def _fused_solve_trans(tiles, invs, x, l_ids, l_rows, uc_ids, uc_rows):
    """Whole TRANSPOSE solve (A^T x = b from the same factors,
    A^T = U^T L^T) in one dispatch.  LEFT-looking so the existing
    column-panel tables serve both sweeps: forward on U^T gathers
    column k's above-diagonal tiles transposed; backward on L^T its
    below-diagonal tiles.  Padded entries contribute exactly zero (the
    scratch x-segment is never written, so it stays zero).  Diag steps
    are matmuls against the transposed persisted inverses
    ((U^-1)^T = (U^T)^-1)."""
    bl = l_ids.shape[0]
    dt = x.dtype

    def level(k, x, inv_slot, ids, rows):
        upd = jnp.einsum("bji,bjr->ir", tiles[ids[k]], x[rows[k]],
                         preferred_element_type=dt)
        acc = x[k] - upd
        xk = jnp.matmul(invs[k, inv_slot].T, acc,
                        preferred_element_type=dt)
        return x.at[k].set(xk)

    def fwd(k, x):                      # U^T y = b
        return level(k, x, 1, uc_ids, uc_rows)

    def bwd(i, x):                      # L^T x = y
        return level(bl - 1 - i, x, 0, l_ids, l_rows)

    x = jax.lax.fori_loop(0, bl, fwd, x)
    x = jax.lax.fori_loop(0, bl, bwd, x)
    return x


@functools.partial(jax.jit, donate_argnums=(2,))
def _solve_inv_xla(tiles, invs, x, l_ids, l_rows, uc_ids, uc_rows):
    """Matmul-only fused f32 solve against persisted triangle inverses
    (the XLA correction engine for the dd IR solve when the Pallas
    mega_solve is ineligible)."""
    bl = l_ids.shape[0]
    dt = x.dtype

    def level(k, x, inv_slot, ids, rows):
        xk = jnp.matmul(invs[k, inv_slot], x[k], preferred_element_type=dt)
        x = x.at[k].set(xk)
        upd = jnp.matmul(tiles[ids[k]], xk, preferred_element_type=dt)
        return x.at[rows[k]].add(-upd)

    def fwd(k, x):
        return level(k, x, 0, l_ids, l_rows)

    def bwd(i, x):
        return level(bl - 1 - i, x, 1, uc_ids, uc_rows)

    x = jax.lax.fori_loop(0, bl, fwd, x)
    x = jax.lax.fori_loop(0, bl, bwd, x)
    return x


@functools.partial(jax.jit,
                   static_argnames=("nb", "bl", "npan", "iters",
                                    "use_mega", "ggeo"))
def _dd_ir_solve(xbh, xbl, a_th, a_tl, th, invh,
                 row_ids, row_cols,
                 l_ids, l_rows, uc_ids, uc_rows,
                 nl_tab, nuc_tab, lid_tab, lrow_tab, ucid_tab, ucrow_tab,
                 gtabs=None,
                 *, nb, bl, npan, iters, use_mega, ggeo=None):
    """r64 solve at f32-solve speed: device-fused mixed-precision
    iterative refinement.  One dispatch runs (1) an f32 triangular
    solve against the dd factors' HI parts (Pallas mega_solve when
    eligible), then ``iters`` rounds of (2) EXACT dd blocked residual
    ``r = b - A x`` (ops.dd.dd_blocked_residual) and (3) an f32
    correction solve, accumulating x in dd.  No host round trips — the
    TPU-idiomatic replacement for the reference's native R64 SpTRSV
    (pangulu_sptrsv.c; R64 default pangulu_common.h:11-33).

    Converges to ~f64-class residuals in 2-3 rounds while
    cond(A) << 1/eps_f32 (~1e7); beyond that the all-dd fused solve
    (``_fused_solve_dd``) remains the robust fallback."""
    from pangulu_tpu.ops import dd as D

    def corr(r):
        # f32 solve LU dx = r on the hi factors
        if use_mega and ggeo is not None:
            # batched-group solve (compressing schedules)
            from pangulu_tpu.ops.kernels_pallas import mega_solve_groups

            ngr, gmax, row_w = ggeo
            xt = jnp.transpose(r, (2, 0, 1))       # [nrhs, bl+1, nb]
            xt = mega_solve_groups(
                xt, th, invh, gtabs["nl_tab"], gtabs["nuc_tab"],
                gtabs["kseg_tab"], gtabs["ltab"], gtabs["uctab"],
                nb=nb, bl=bl, ngr=ngr, gmax=gmax, npan=row_w)
            return jnp.transpose(xt, (1, 2, 0))
        if use_mega:
            from pangulu_tpu.ops.kernels_pallas import mega_solve

            xt = jnp.transpose(r, (2, 0, 1))       # [nrhs, bl+1, nb]
            xt = mega_solve(xt, th, invh, nl_tab, nuc_tab, lid_tab,
                            lrow_tab, ucid_tab, ucrow_tab,
                            nb=nb, bl=bl, npan=npan)
            return jnp.transpose(xt, (1, 2, 0))
        return _solve_inv_xla(th, invh, r, l_ids, l_rows,
                              uc_ids, uc_rows)

    xh = corr(xbh)
    xl = jnp.zeros_like(xh)
    for _ in range(iters):
        rh, rl = D.dd_blocked_residual(a_th, a_tl, row_ids, row_cols,
                                       xh, xl, xbh, xbl)
        dx = corr(rh)
        xh, xl = D.dd_add(xh, xl, dx, jnp.zeros_like(dx))
    return xh, xl


@functools.partial(jax.jit, donate_argnums=(4, 5))
def _fused_solve_dd(th, tl, invh, invl, xh, xl, l_ids, l_rows,
                    uc_ids, uc_rows):
    """Whole forward+backward solve in dd arithmetic — matmul-only
    against the per-level dd triangle inverses persisted by the dd
    factorization (numeric._fused_factorize_dd)."""
    from pangulu_tpu.ops import dd as D

    bl = l_ids.shape[0]

    def level(k, x, inv_slot, ids, rows):
        xh, xl = x
        kh, kl = D.dd_matmul(invh[k, inv_slot], invl[k, inv_slot],
                             xh[k], xl[k])
        xh = xh.at[k].set(kh)
        xl = xl.at[k].set(kl)
        ph, pl = D.dd_matmul(th[ids[k]], tl[ids[k]], kh, kl)
        rws = rows[k]
        nh, nl = D.dd_sub(xh[rws], xl[rws], ph, pl)
        return xh.at[rws].set(nh), xl.at[rws].set(nl)

    def fwd(k, x):
        return level(k, x, 0, l_ids, l_rows)

    def bwd(i, x):
        return level(bl - 1 - i, x, 1, uc_ids, uc_rows)

    x = jax.lax.fori_loop(0, bl, fwd, (xh, xl))
    x = jax.lax.fori_loop(0, bl, bwd, x)
    return x


class TriangularSolver:
    """gstrs executor over factored tiles."""

    def __init__(self, blocked: BlockedMatrix, schedule: Schedule,
                 backend: KernelBackend | None = None,
                 perf: PerfCounters | None = None,
                 dispatch: str = "fused",
                 precision: str = "highest",
                 inv_tiles=None):
        self.precision = precision
        self.blocked = blocked
        self.schedule = schedule
        self.backend = backend or get_backend(
            "auto", nb=blocked.nb, dtype=blocked.dtype)
        self.perf = perf or PerfCounters()
        self.dispatch = dispatch
        # triangle inverses persisted by the Pallas mega factorization:
        # enables the single-launch matmul-only solve kernel
        self.inv_tiles = inv_tiles
        self._mega_tables = None
        self._mega_group_tables = None
        if dispatch == "fused":
            self._fused_args = tuple(
                jnp.asarray(t) for t in self.schedule.fused_solve_tables(
                    self.blocked.num_tiles, self.schedule.block_length))
            self._lower_args = self._upper_args = None
        else:
            self._lower_args, self._upper_args = self._prepare()

    def _prepare(self):
        scratch_seg = self.schedule.block_length  # scratch x-segment
        lower, upper = [], []
        for lev in self.schedule.levels:
            nl = bucket(len(lev.lpanel))
            lower.append((
                np.array([lev.diag], dtype=np.int32),
                np.array([lev.k], dtype=np.int32),
                pad_ids(lev.lpanel, nl, self.blocked.num_tiles),
                pad_ids(lev.lrows, nl, scratch_seg),
            ))
            nu = bucket(len(lev.ucolpanel))
            upper.append((
                np.array([lev.diag], dtype=np.int32),
                np.array([lev.k], dtype=np.int32),
                pad_ids(lev.ucolpanel, nu, self.blocked.num_tiles),
                pad_ids(lev.ucolrows, nu, scratch_seg),
            ))
        return lower, upper

    def blockify_rhs(self, b: np.ndarray) -> jnp.ndarray:
        """[n] or [n, nrhs] -> [bl+1, nb, nrhs] padded segments."""
        bl, nb = self.schedule.block_length, self.schedule.nb
        b = np.asarray(b)
        if b.ndim == 1:
            b = b[:, None]
        nrhs = b.shape[1]
        xb = np.zeros((bl + 1, nb, nrhs), dtype=self.blocked.dtype)
        flat = xb[:bl].reshape(bl * nb, nrhs)
        flat[: b.shape[0]] = b
        return jnp.asarray(xb)

    def unblockify(self, xb) -> np.ndarray:
        bl, nb = self.schedule.block_length, self.schedule.nb
        n = self.blocked.n
        out = np.asarray(xb)[:bl].reshape(bl * nb, -1)[:n]
        return out

    def _ensure_inverses(self, tiles):
        """Triangle inverses for every level, recomputed from the packed
        factors when the factorization didn't persist them (e.g. a
        checkpoint-loaded handle).  Unlike the factorization itself the
        inverses have NO cross-level dependency, so this is one batched
        Newton pass over all diagonal tiles."""
        if self.inv_tiles is not None:
            return self.inv_tiles
        from pangulu_tpu.ops.kernels_jax import (DEFAULT_TOL,
                                                 unit_lower_inv_newton,
                                                 upper_inv_newton)

        diag_ids = jnp.asarray(
            np.array([lev.diag for lev in self.schedule.levels],
                     dtype=np.int32))
        tol = float(DEFAULT_TOL[jnp.dtype(self.blocked.dtype)])

        @jax.jit
        def _compute(tiles):
            diags = tiles[diag_ids]
            linv = jax.vmap(unit_lower_inv_newton)(diags)
            uinv = jax.vmap(lambda f: upper_inv_newton(f, tol))(diags)
            return jnp.stack([linv, uinv], axis=1)

        with jax.default_matmul_precision(self.precision):
            self.inv_tiles = _compute(jnp.asarray(tiles))
        return self.inv_tiles

    def _log_engine(self, engine: str, why: str = "") -> None:
        """One log line per distinct solve-engine choice — the solve
        analogue of the factorizer's dispatch log (numeric.py:369): a
        silent ~5x fallback (e.g. dtype!=f32 on chip) is the same perf
        mystery class."""
        msg = f"{engine} ({why})" if why else engine
        seen = getattr(self, "_logged_engines", None)
        if seen is None:
            seen = self._logged_engines = set()
        if msg not in seen:
            seen.add(msg)
            log.info("solve engine: %s", msg)

    def _mega_fallback_reason(self) -> str:
        if jax.default_backend() != "tpu":
            return "not on a TPU backend"
        if self.backend.name != "pallas":
            return f"backend={self.backend.name} (not pallas)"
        why = []
        if jnp.dtype(self.blocked.dtype) != jnp.float32:
            why.append(f"dtype={jnp.dtype(self.blocked.dtype).name}!=f32")
        if self.schedule.nb not in (128, 256):
            why.append(f"nb={self.schedule.nb} not in (128, 256)")
        return "mega ineligible: " + ", ".join(why) if why else ""

    def _mega_eligible(self, nrhs: int) -> bool:
        import jax as _jax

        if self.backend.name != "pallas":
            return False
        if _jax.default_backend() != "tpu":
            return False
        # panels of any width stream in bounded-VMEM chunks; nb=256 is
        # the reference default (pangulu.c:52-56) and fits the solve
        # kernels' VMEM budget (tbuf 2*pchunk*nb^2*4B <= 16 MiB under
        # the raised 100 MiB cap)
        return (jnp.dtype(self.blocked.dtype) == jnp.float32
                and self.schedule.nb in (128, 256)
                and self._mega_nrhs_max() >= 1)

    def _mega_nrhs_max(self) -> int:
        """Largest RHS batch whose x fits the solve kernel's VMEM
        budget (larger batches are solved in chunks of this size)."""
        from pangulu_tpu.ops.kernels_pallas import MEGA_SOLVE_MAX_X_BYTES

        bl, nb = self.schedule.block_length, self.schedule.nb
        per_rhs = (bl + 1) * nb * np.dtype(self.blocked.dtype).itemsize
        return max(MEGA_SOLVE_MAX_X_BYTES // per_rhs, 0)

    def _solve_group_worthwhile(self) -> bool:
        """Batched-group solve pays when the schedule compresses
        (same heuristic as the factorization engines): the solve's
        dependent-contraction chain shortens from bl steps to the
        group count.  Chain schedules (RCM) stay on the per-level
        kernel.  Override via PANGULU_TPU_SOLVE_GROUP=0/1."""
        import os

        env = os.environ.get("PANGULU_TPU_SOLVE_GROUP")
        if env is not None:
            return env == "1"
        bl = self.schedule.block_length
        gmax = 16
        ng = sum(-(-len(m) // gmax)
                 for m in self.schedule.superlevels())
        return bl >= 1.5 * ng

    def _solve_mega(self, tiles, b: np.ndarray) -> np.ndarray:
        """Single-launch Pallas solve against the persisted triangle
        inverses (pure MXU contractions; no substitution loops)."""
        from pangulu_tpu.ops.kernels_pallas import mega_solve
        from pangulu_tpu.schedule import bucket

        bl, nb = self.schedule.block_length, self.schedule.nb
        b2 = np.asarray(b)
        squeeze = b2.ndim == 1
        if squeeze:
            b2 = b2[:, None]
        nrhs = b2.shape[1]
        cap = self._mega_nrhs_max()
        if nrhs > cap:
            # solve wide RHS batches in VMEM-sized chunks
            out = np.concatenate(
                [self._solve_mega(tiles, b2[:, c:c + cap])
                 for c in range(0, nrhs, cap)], axis=1)
            return out[:, 0] if squeeze else out
        invs = self._ensure_inverses(tiles)
        xh = np.zeros((nrhs, bl + 1, nb), dtype=self.blocked.dtype)
        xh[:, :bl].reshape(nrhs, bl * nb)[:, : self.blocked.n] = b2.T
        if self._solve_group_worthwhile():
            from pangulu_tpu.ops.kernels_pallas import mega_solve_groups

            self._log_engine("mega_groups",
                             "single-launch Pallas, super-level groups")
            if self._mega_group_tables is None:
                t = self.schedule.group_solve_tables(
                    self.blocked.num_tiles)
                geo = (t.pop("ngroups"), t.pop("gmax"), t.pop("row_w"))
                self._mega_group_tables = (
                    {k: jnp.asarray(v) for k, v in t.items()}, geo)
            t, (ngr, gmax, row_w) = self._mega_group_tables
            with self.perf.phase("sptrsv"):
                x = mega_solve_groups(
                    jnp.asarray(xh), tiles, invs, t["nl_tab"],
                    t["nuc_tab"], t["kseg_tab"], t["ltab"], t["uctab"],
                    nb=nb, bl=bl, ngr=ngr, gmax=gmax, npan=row_w)
                x = device_sync(x)
            out = np.asarray(x)[:, :bl].reshape(
                nrhs, bl * nb)[:, : self.blocked.n].T
            return out[:, 0] if squeeze else out
        self._log_engine("mega", "single-launch Pallas")
        if self._mega_tables is None:
            t = self.schedule.mega_solve_tables(self.blocked.num_tiles)
            npan = max(bucket(max(int(t["nl_tab"].max(initial=0)),
                                  int(t["nuc_tab"].max(initial=0)), 1)), 1)
            self._mega_tables = (
                {k: jnp.asarray(v) for k, v in t.items()}, npan)
        t, npan = self._mega_tables
        with self.perf.phase("sptrsv"):
            x = mega_solve(jnp.asarray(xh), tiles, invs,
                           t["nl_tab"], t["nuc_tab"], t["lid_tab"],
                           t["lrow_tab"], t["ucid_tab"], t["ucrow_tab"],
                           nb=nb, bl=bl, npan=npan)
            x = device_sync(x)
        out = np.asarray(x)[:, :bl].reshape(
            nrhs, bl * nb)[:, : self.blocked.n].T
        return out[:, 0] if squeeze else out

    # dd solve method: "ir" = device-fused mixed-precision iterative
    # refinement (f32 mega/inv corrections + exact dd residuals; ~the
    # f32 solve speed), "dd" = all-dd fused solve (level-latency-bound
    # but robust for cond(A) near/beyond 1/eps_f32).
    dd_solve_method = "ir"
    dd_ir_iters = 3

    def _ensure_dd_ir_state(self):
        """Lazy device state for the dd IR solve: the ORIGINAL A3 tiles
        as a dd pair (the host tile store still holds A3 — the
        factorization ran on device copies) plus the block-row gather
        tables for the residual."""
        if getattr(self, "_dd_ir_state", None) is not None:
            return self._dd_ir_state
        blocked, bl = self.blocked, self.schedule.block_length
        host = blocked.tiles
        hi = host.astype(np.float32)
        lo = (host - hi.astype(np.float64)).astype(np.float32)
        a_th, a_tl = jnp.asarray(hi), jnp.asarray(lo)
        w = max(int(np.diff(blocked.brownnzptr).max()), 1)
        row_ids = np.full((bl, w), blocked.num_tiles, np.int32)
        row_cols = np.full((bl, w), bl, np.int32)  # pad: scratch seg
        for k in range(bl):
            s, e = blocked.brownnzptr[k], blocked.brownnzptr[k + 1]
            row_ids[k, : e - s] = blocked.tile_of_csr[s:e]
            row_cols[k, : e - s] = blocked.bcolidx[s:e]
        fused = tuple(jnp.asarray(t) for t in
                      self.schedule.fused_solve_tables(
                          blocked.num_tiles, bl))[1:]
        mt = self.schedule.mega_solve_tables(blocked.num_tiles)
        npan = max(bucket(max(int(mt["nl_tab"].max(initial=0)),
                              int(mt["nuc_tab"].max(initial=0)), 1)), 1)
        mega = {k: jnp.asarray(v) for k, v in mt.items()}
        import jax as _jax

        use_mega = (self.backend.name == "pallas"
                    and _jax.default_backend() == "tpu"
                    and self.schedule.nb in (128, 256))
        gtabs = ggeo = None
        if use_mega and self._solve_group_worthwhile():
            gt = self.schedule.group_solve_tables(self.blocked.num_tiles)
            ggeo = (gt.pop("ngroups"), gt.pop("gmax"), gt.pop("row_w"))
            gtabs = {k: jnp.asarray(v) for k, v in gt.items()}
        self._dd_ir_state = (a_th, a_tl, jnp.asarray(row_ids),
                             jnp.asarray(row_cols), fused, mega, npan,
                             use_mega, gtabs, ggeo)
        return self._dd_ir_state

    def _solve_dd(self, tiles, b: np.ndarray) -> np.ndarray:
        """r64-on-TPU solve from dd factors (see dd_solve_method)."""
        if self.inv_tiles is None or not isinstance(self.inv_tiles,
                                                    tuple):
            raise RuntimeError(
                "dd solve requires the dd factorization's persisted "
                "inverses (factor with the dd engine first)")
        invh, invl = self.inv_tiles
        bl, nb = self.schedule.block_length, self.schedule.nb
        b2 = np.asarray(b, dtype=np.float64)
        squeeze = b2.ndim == 1
        if squeeze:
            b2 = b2[:, None]
        nrhs = b2.shape[1]
        xb = np.zeros((bl + 1, nb, nrhs), dtype=np.float64)
        xb[:bl].reshape(bl * nb, nrhs)[: b2.shape[0]] = b2
        xh = xb.astype(np.float32)
        xl = (xb - xh.astype(np.float64)).astype(np.float32)
        if self.dd_solve_method == "ir":
            (a_th, a_tl, row_ids, row_cols, fused, mega, npan,
             use_mega, gtabs, ggeo) = self._ensure_dd_ir_state()
            self._log_engine(
                "dd_ir",
                "mixed-precision refinement, corrections via "
                + ("Pallas mega" + ("_groups" if ggeo else "")
                   if use_mega else "XLA inverse solve"))
            l_ids, l_rows, uc_ids, uc_rows = fused
            with self.perf.phase("sptrsv"):
                oh, ol = _dd_ir_solve(
                    jnp.asarray(xh), jnp.asarray(xl), a_th, a_tl,
                    tiles.hi, invh, row_ids, row_cols,
                    l_ids, l_rows, uc_ids, uc_rows,
                    mega["nl_tab"], mega["nuc_tab"], mega["lid_tab"],
                    mega["lrow_tab"], mega["ucid_tab"],
                    mega["ucrow_tab"], gtabs, nb=nb, bl=bl, npan=npan,
                    iters=self.dd_ir_iters, use_mega=use_mega,
                    ggeo=ggeo)
        else:
            self._log_engine("dd_fused", "all-dd matmul-only solve")
            _, l_ids, l_rows, uc_ids, uc_rows = (
                jnp.asarray(t) for t in self.schedule.fused_solve_tables(
                    self.blocked.num_tiles, bl))
            with self.perf.phase("sptrsv"):
                oh, ol = _fused_solve_dd(
                    tiles.hi, tiles.lo, invh, invl, jnp.asarray(xh),
                    jnp.asarray(xl), l_ids, l_rows, uc_ids, uc_rows)
        # ONE batched transfer for both planes: on the tunneled backend
        # every independent host read costs a full ~26 ms round trip
        # (device_sync + two np.asarray reads here measured as the
        # 85-115 ms single-call dd gstrs cliff, BASELINE r3); a single
        # device_get forces completion AND moves both arrays in one
        # trip.
        with self.perf.phase("sptrsv"):
            oh_host, ol_host = jax.device_get((oh, ol))
        out = (oh_host.astype(np.float64) + ol_host.astype(np.float64))
        out = out[:bl].reshape(bl * nb, nrhs)[: self.blocked.n]
        return out[:, 0] if squeeze else out

    def solve_trans(self, tiles, b: np.ndarray) -> np.ndarray:
        """Solve (LU)^T x = b on the same factors (transpose solve —
        no reference equivalent; SuperLU-style trans surface)."""
        squeeze = np.asarray(b).ndim == 1
        x = self.blockify_rhs(b)
        tiles = device_sync(jnp.asarray(tiles))
        invs = self._ensure_inverses(tiles)
        _, l_ids, l_rows, uc_ids, uc_rows = (
            jnp.asarray(t) for t in self.schedule.fused_solve_tables(
                self.blocked.num_tiles, self.schedule.block_length))
        ctx = jax.default_matmul_precision(self.precision)
        with self.perf.phase("sptrsv"), ctx:
            x = _fused_solve_trans(tiles, invs, x, l_ids, l_rows,
                                   uc_ids, uc_rows)
            x = device_sync(x)
        out = self.unblockify(x)
        return out[:, 0] if squeeze else out

    def solve_blocked(self, tiles, xb):
        """Device-resident solve: ``xb`` is an ALREADY-BLOCKED rhs on
        device (``[bl+1, nb, nrhs]``, see :meth:`blockify_rhs`; for dd
        factors a ``(hi, lo)`` pair of such arrays) and the result
        comes back in the same blocked layout WITHOUT a host sync.
        The input buffer may be DONATED (consumed) by the underlying
        engine — do not reuse it after the call.

        This is the serving path: back-to-back solves chain entirely
        on-device, paying zero host round trips between them (one
        tunnel readback costs ~26 ms here — more than ten mega_solve
        launches).  The reference's pangulu_gstrs always runs host-
        resident vectors (pangulu_sptrsv.c); on TPU the device-resident
        chain is the idiomatic equivalent of its repeated-solve loop.
        """
        from pangulu_tpu.numeric import DdTiles

        if isinstance(tiles, DdTiles):
            xh, xl = (xb if isinstance(xb, tuple)
                      else (xb, jnp.zeros_like(xb)))
            invh, invl = self.inv_tiles
            (a_th, a_tl, row_ids, row_cols, fused, mega, npan,
             use_mega, gtabs, ggeo) = self._ensure_dd_ir_state()
            l_ids, l_rows, uc_ids, uc_rows = fused
            nb, bl = self.schedule.nb, self.schedule.block_length
            return _dd_ir_solve(
                xh, xl, a_th, a_tl, tiles.hi, invh, row_ids, row_cols,
                l_ids, l_rows, uc_ids, uc_rows,
                mega["nl_tab"], mega["nuc_tab"], mega["lid_tab"],
                mega["lrow_tab"], mega["ucid_tab"], mega["ucrow_tab"],
                gtabs, nb=nb, bl=bl, npan=npan,
                iters=self.dd_ir_iters, use_mega=use_mega, ggeo=ggeo)
        nrhs = int(xb.shape[-1])
        if self._mega_eligible(nrhs) and nrhs <= self._mega_nrhs_max():
            from pangulu_tpu.ops.kernels_pallas import (
                mega_solve, mega_solve_groups,
            )
            from pangulu_tpu.schedule import bucket

            bl, nb = self.schedule.block_length, self.schedule.nb
            invs = self._ensure_inverses(tiles)
            xt = jnp.transpose(xb, (2, 0, 1))      # [nrhs, bl+1, nb]
            if self._solve_group_worthwhile():
                self._log_engine(
                    "mega_groups",
                    "single-launch Pallas, super-level groups")
                if self._mega_group_tables is None:
                    t = self.schedule.group_solve_tables(
                        self.blocked.num_tiles)
                    geo = (t.pop("ngroups"), t.pop("gmax"),
                           t.pop("row_w"))
                    self._mega_group_tables = (
                        {k: jnp.asarray(v) for k, v in t.items()}, geo)
                t, (ngr, gmax, row_w) = self._mega_group_tables
                xt = mega_solve_groups(
                    xt, tiles, invs, t["nl_tab"], t["nuc_tab"],
                    t["kseg_tab"], t["ltab"], t["uctab"],
                    nb=nb, bl=bl, ngr=ngr, gmax=gmax, npan=row_w)
                return jnp.transpose(xt, (1, 2, 0))
            self._log_engine("mega", "single-launch Pallas")
            if self._mega_tables is None:
                t = self.schedule.mega_solve_tables(self.blocked.num_tiles)
                npan = max(bucket(max(int(t["nl_tab"].max(initial=0)),
                                      int(t["nuc_tab"].max(initial=0)),
                                      1)), 1)
                self._mega_tables = (
                    {k: jnp.asarray(v) for k, v in t.items()}, npan)
            t, npan = self._mega_tables
            xt = mega_solve(xt, tiles, invs, t["nl_tab"], t["nuc_tab"],
                            t["lid_tab"], t["lrow_tab"], t["ucid_tab"],
                            t["ucrow_tab"], nb=nb, bl=bl, npan=npan)
            return jnp.transpose(xt, (1, 2, 0))
        self._log_engine("fused", self._mega_fallback_reason())
        tiles = jnp.asarray(tiles)
        with jax.default_matmul_precision(self.precision):
            return _fused_solve(self.backend, tiles, xb,
                                *self._fused_args)

    def solve(self, tiles, b: np.ndarray) -> np.ndarray:
        """Solve LU x = b on the factored tiles.  Returns x with the
        same leading shape as b (pangulu_solve, pangulu_sptrsv.c:176)."""
        from pangulu_tpu.numeric import DdTiles

        if isinstance(tiles, DdTiles):
            return self._solve_dd(tiles, b)
        squeeze = np.asarray(b).ndim == 1
        nrhs = 1 if squeeze else np.asarray(b).shape[1]
        if self._mega_eligible(nrhs):
            return self._solve_mega(tiles, b)
        self._log_engine(self.dispatch, self._mega_fallback_reason())
        x = self.blockify_rhs(b)
        if self.dispatch == "fused":
            tiles = device_sync(jnp.asarray(tiles))
            ctx = jax.default_matmul_precision(self.precision)
            with self.perf.phase("sptrsv"), ctx:
                x = _fused_solve(self.backend, tiles, x, *self._fused_args)
                x = device_sync(x)
            out = self.unblockify(x)
            return out[:, 0] if squeeze else out
        ctx = jax.default_matmul_precision(self.precision)
        with self.perf.phase("sptrsv"), ctx:
            for (diag_idx, k, ids, rows) in self._lower_args:
                x = _seg_solve(self.backend, tiles, x, (diag_idx, k), True)
                if len(ids):
                    x = _seg_update(self.backend, tiles, x, k, ids, rows)
            for (diag_idx, k, ids, rows) in reversed(self._upper_args):
                x = _seg_solve(self.backend, tiles, x, (diag_idx, k), False)
                if len(ids):
                    x = _seg_update(self.backend, tiles, x, k, ids, rows)
            x = device_sync(x)
        out = self.unblockify(x)
        return out[:, 0] if squeeze else out
