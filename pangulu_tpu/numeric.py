"""Numeric LU factorization engine (single-chip path).

Counterpart of the reference's DAG scheduler + compute/comm threads
(``pangulu_numeric.c:256-1080``), re-expressed TPU-natively.  The TPU
fast path is the Pallas MEGA-KERNEL (ops/kernels_pallas.mega_factorize):
the entire elimination loop in one launch, auto-selected by
``_mega_eligible``.  The portable engines below run everywhere: a host
dispatch loop walks the precomputed level schedule; each level runs

  1. a fixed-shape jitted *diag step* — GETRF of the diagonal tile plus
     inversion of its two triangles (compiled once per dtype/nb), and
  2. a variable-shape jitted *panel+Schur step* — pure gathers, batched
     MXU matmuls and scatter-adds (cheap to compile; bucket-padded so
     the jit cache stays O(log max_batch)).

Panel solves are matmuls against the precomputed triangular inverses —
the TPU-idiomatic replacement for the reference's per-block sparse
substitutions (TSTRF/GESSM, pangulu_platform_0100000.c:137-209): one
nb^3/3 inversion per level turns every panel solve into MXU work.
Substitution-based solves remain available on the backend
(``tstrf``/``gessm``) with ``panel_solve="trsm"``.

Device buffers are donated so tiles update in place in HBM; XLA's async
dispatch pipelines level k+1's host work under level k's device work
(the role of the reference's separate comm thread).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pangulu_tpu.blocks import BlockedMatrix
from pangulu_tpu.ops.interface import KernelBackend, get_backend
from pangulu_tpu.ops.kernels_pallas import x32_trace
from pangulu_tpu.schedule import Schedule, bucket, build_schedule, pad_ids
from pangulu_tpu.utils import device_sync
from pangulu_tpu.utils.log import get_logger
from pangulu_tpu.utils.perf import PerfCounters

log = get_logger()


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _diag_step(backend: KernelBackend, tiles, diag_idx):
    """GETRF the diagonal tile; return triangle inverses."""
    diag, linv, uinv = backend.diag_factor_invert(tiles[diag_idx[0]], backend.tol)
    tiles = tiles.at[diag_idx[0]].set(diag)
    return tiles, linv, uinv


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _panel_schur_step(backend: KernelBackend, tiles, linv, uinv,
                      l_ids, u_ids, upd_dst, upd_lsel, upd_usel):
    """Batched panel solves (as matmuls) + batched Schur update."""
    dt = tiles.dtype
    nl, nu = l_ids.shape[0], u_ids.shape[0]
    nb = tiles.shape[-1]
    lblk = (jnp.matmul(tiles[l_ids], uinv, preferred_element_type=dt)
            if nl else jnp.zeros((0, nb, nb), dt))
    ublk = (jnp.matmul(linv, tiles[u_ids], preferred_element_type=dt)
            if nu else jnp.zeros((0, nb, nb), dt))
    if nl:
        tiles = tiles.at[l_ids].set(lblk)
    if nu:
        tiles = tiles.at[u_ids].set(ublk)
    if upd_dst.shape[0]:
        prod = jnp.matmul(lblk[upd_lsel], ublk[upd_usel],
                          preferred_element_type=dt)
        tiles = tiles.at[upd_dst].add(-prod)
    return tiles


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _panel_schur_step_trsm(backend: KernelBackend, tiles, diag,
                           l_ids, u_ids, upd_dst, upd_lsel, upd_usel):
    """Substitution-based variant (higher accuracy, slower on TPU)."""
    dt = tiles.dtype
    nl, nu = l_ids.shape[0], u_ids.shape[0]
    nb = tiles.shape[-1]
    lblk = (backend.tstrf(jnp.broadcast_to(diag, (nl, nb, nb)), tiles[l_ids])
            if nl else jnp.zeros((0, nb, nb), dt))
    ublk = (backend.gessm(jnp.broadcast_to(diag, (nu, nb, nb)), tiles[u_ids])
            if nu else jnp.zeros((0, nb, nb), dt))
    if nl:
        tiles = tiles.at[l_ids].set(lblk)
    if nu:
        tiles = tiles.at[u_ids].set(ublk)
    if upd_dst.shape[0]:
        prod = jnp.matmul(lblk[upd_lsel], ublk[upd_usel],
                          preferred_element_type=dt)
        tiles = tiles.at[upd_dst].add(-prod)
    return tiles


class DdTiles:
    """Factored tiles in double-float representation (hi/lo f32 pairs)
    — the r64-on-TPU storage (ops.dd).  ``np.asarray`` yields the f64
    combination, so checkpointing/gather_factor work unchanged."""

    def __init__(self, hi, lo):
        self.hi = hi
        self.lo = lo

    def __array__(self, dtype=None, copy=None):
        out = (np.asarray(self.hi).astype(np.float64)
               + np.asarray(self.lo).astype(np.float64))
        return out.astype(dtype) if dtype is not None else out


@x32_trace
@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3))
def _fused_factorize_dd(nb: int, tol: float, th, tl, diag_idx, l_ids,
                        u_ids, upd_dst, upd_l, upd_u):
    """r64 factorization on TPU hardware: the fused level engine in
    double-float arithmetic (ops.dd) — every matmul an exact-sliced
    f32 MXU product, every elementwise op an error-free-transform
    pair.  ~48-bit results without touching the ~1000x-slower emulated
    f64 path.  Also persists the per-level dd triangle inverses for
    the matmul-only dd solve."""
    from pangulu_tpu.ops import dd as D

    bl = diag_idx.shape[0]
    invh = jnp.zeros((bl, 2, nb, nb), jnp.float32)
    invl = jnp.zeros_like(invh)

    def body(k, c):
        th, tl, invh, invl = c
        d = diag_idx[k]
        (dh, dl), (lih, lil), (uih, uil) = D.dd_lu_inverses(
            th[d], tl[d], nb=nb, tol=tol)
        th = th.at[d].set(dh)
        tl = tl.at[d].set(dl)
        invh = invh.at[k, 0].set(lih)
        invl = invl.at[k, 0].set(lil)
        invh = invh.at[k, 1].set(uih)
        invl = invl.at[k, 1].set(uil)
        lbh, lbl = D.dd_matmul(th[l_ids[k]], tl[l_ids[k]], uih, uil)
        th = th.at[l_ids[k]].set(lbh)
        tl = tl.at[l_ids[k]].set(lbl)
        ubh, ubl = D.dd_matmul(lih, lil, th[u_ids[k]], tl[u_ids[k]])
        th = th.at[u_ids[k]].set(ubh)
        tl = tl.at[u_ids[k]].set(ubl)
        ph, pl = D.dd_matmul(lbh[upd_l[k]], lbl[upd_l[k]],
                             ubh[upd_u[k]], ubl[upd_u[k]])
        # dd scatter-subtract = gather, renormalizing dd_sub, set
        # (destinations are unique within a level)
        nh, nl2 = D.dd_sub(th[upd_dst[k]], tl[upd_dst[k]], ph, pl)
        th = th.at[upd_dst[k]].set(nh)
        tl = tl.at[upd_dst[k]].set(nl2)
        return th, tl, invh, invl

    return jax.lax.fori_loop(0, bl, body, (th, tl, invh, invl))


@x32_trace
@functools.partial(jax.jit, static_argnums=(0, 1),
                   donate_argnums=(2, 3, 4, 5))
def _group_factorize_dd(nb: int, tol: float, th, tl, invh, invl,
                        lev_ids, diag_idx, l_ids, l_dsel, u_ids,
                        u_dsel, upd_dst, upd_l, upd_u):
    """Super-level GROUP dd engine: one fori iteration factors a whole
    group of independent same-depth columns — G batched dd LU scans
    (vmapped ``dd_lu_inverses``: the Pallas rank-1 scan batches into
    one gridded launch), union panels against per-member inverses, and
    WAVE-SPLIT updates (dd's gather / renormalizing ``dd_sub`` / set
    needs unique destinations per application; wave w carries every
    destination's w-th occurrence — see
    ``Schedule.superfused_wave_tables``).  Amortizes the per-level
    sequential scan latency that dominates the dd engine under
    nested-dissection schedules (depth << bl); the dd analogue of the
    batched-group mega kernel and of the reference's concurrent
    ready-GETRF seeding (pangulu_numeric.c:1054-1068)."""
    from pangulu_tpu.ops import dd as D

    ns, W = diag_idx.shape[0], upd_dst.shape[1]

    def body(s, c):
        th, tl, invh, invl = c
        d_idx = diag_idx[s]
        (dh, dl), (lih, lil), (uih, uil) = jax.vmap(
            lambda h, l: D.dd_lu_inverses(h, l, nb=nb, tol=tol))(
                th[d_idx], tl[d_idx])
        th = th.at[d_idx].set(dh)
        tl = tl.at[d_idx].set(dl)
        ks = lev_ids[s]
        invh = invh.at[ks, 0].set(lih)
        invl = invl.at[ks, 0].set(lil)
        invh = invh.at[ks, 1].set(uih)
        invl = invl.at[ks, 1].set(uil)
        lbh, lbl = D.dd_matmul(th[l_ids[s]], tl[l_ids[s]],
                               uih[l_dsel[s]], uil[l_dsel[s]])
        th = th.at[l_ids[s]].set(lbh)
        tl = tl.at[l_ids[s]].set(lbl)
        ubh, ubl = D.dd_matmul(lih[u_dsel[s]], lil[u_dsel[s]],
                               th[u_ids[s]], tl[u_ids[s]])
        th = th.at[u_ids[s]].set(ubh)
        tl = tl.at[u_ids[s]].set(ubl)

        def wave(w, c2):
            th, tl = c2
            dst = upd_dst[s, w]
            ph, pl = D.dd_matmul(lbh[upd_l[s, w]], lbl[upd_l[s, w]],
                                 ubh[upd_u[s, w]], ubl[upd_u[s, w]])
            nh, nl2 = D.dd_sub(th[dst], tl[dst], ph, pl)
            return th.at[dst].set(nh), tl.at[dst].set(nl2)

        th, tl = jax.lax.fori_loop(0, W, wave, (th, tl))
        return th, tl, invh, invl

    return jax.lax.fori_loop(0, ns, body, (th, tl, invh, invl))


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _superfused_factorize(backend: KernelBackend, tiles, diag_idx,
                          l_ids, l_dsel, u_ids, u_dsel,
                          upd_dst, upd_l, upd_u):
    """Super-level fused engine: one fori iteration factors a whole
    GROUP of independent block columns (equal block-etree depth,
    Schedule.superlevels) — G diagonals in one batched GETRF+invert,
    the union of their panels in one batched matmul against the
    per-member inverses, and all Schur updates in one scatter-add
    (duplicate destinations accumulate; addition commutes).  The
    static-schedule counterpart of the reference's concurrent
    ready-GETRF seeding (pangulu_numeric.c:1054-1068); transformative
    under nested-dissection orderings (depth << bl)."""
    ns = diag_idx.shape[0]
    dt = tiles.dtype

    def body(s, tiles):
        d_idx = diag_idx[s]
        diag, linv, uinv = jax.vmap(
            lambda t: backend.diag_factor_invert(t, backend.tol))(tiles[d_idx])
        tiles = tiles.at[d_idx].set(diag)
        lblk = jnp.matmul(tiles[l_ids[s]], uinv[l_dsel[s]],
                          preferred_element_type=dt)
        tiles = tiles.at[l_ids[s]].set(lblk)
        ublk = jnp.matmul(linv[u_dsel[s]], tiles[u_ids[s]],
                          preferred_element_type=dt)
        tiles = tiles.at[u_ids[s]].set(ublk)
        prod = jnp.matmul(lblk[upd_l[s]], ublk[upd_u[s]],
                          preferred_element_type=dt)
        tiles = tiles.at[upd_dst[s]].add(-prod)
        return tiles

    return jax.lax.fori_loop(0, ns, body, tiles)


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _fused_factorize(backend: KernelBackend, tiles, diag_idx, l_ids, u_ids,
                     upd_dst, upd_l, upd_u):
    """Whole factorization in ONE dispatch: lax.fori_loop over levels
    with fully padded index tables.  This is the TPU fast path — no
    host round-trip between levels (per-level dispatch costs ~100ms+
    over a tunneled chip), one compile for the whole solve."""
    bl = diag_idx.shape[0]
    dt = tiles.dtype
    has_l = l_ids.shape[1] > 0
    has_u = u_ids.shape[1] > 0
    has_upd = upd_dst.shape[1] > 0

    def body(k, tiles):
        d_idx = diag_idx[k]
        diag, linv, uinv = backend.diag_factor_invert(tiles[d_idx], backend.tol)
        tiles = tiles.at[d_idx].set(diag)
        if has_l:
            lids = l_ids[k]
            lblk = jnp.matmul(tiles[lids], uinv, preferred_element_type=dt)
            tiles = tiles.at[lids].set(lblk)
        if has_u:
            uids = u_ids[k]
            ublk = jnp.matmul(linv, tiles[uids], preferred_element_type=dt)
            tiles = tiles.at[uids].set(ublk)
        if has_upd and has_l and has_u:
            prod = jnp.matmul(lblk[upd_l[k]], ublk[upd_u[k]],
                              preferred_element_type=dt)
            tiles = tiles.at[upd_dst[k]].add(-prod)
        return tiles

    return jax.lax.fori_loop(0, bl, body, tiles)


class LUFactorizer:
    """Runs gstrf on a blocked matrix.  Mirrors the reference handle's
    numeric phase (pangulu_gstrf, pangulu.c:211).

    ``dispatch``: "mega" = single-launch Pallas kernel (TPU fast path);
    "mega_group" = the same with batched super-level groups (G
    independent diag chains per iteration — auto-picked when the
    schedule compresses, e.g. nested dissection);
    "fused" = single-dispatch XLA fori_loop engine; "segmented" = fused
    in signature-homogeneous runs (bounds padding on skewed schedules);
    "levels" = per-level bucketed dispatch; "auto" = mega when eligible,
    else fused/segmented by padding overhead.
    """

    # Above this padded/real work ratio the per-level engine wins.
    FUSED_OVERHEAD_LIMIT = 6.0

    def __init__(self, blocked: BlockedMatrix, schedule: Schedule | None = None,
                 backend: KernelBackend | None = None,
                 perf: PerfCounters | None = None,
                 panel_solve: str = "inv",
                 dispatch: str = "auto",
                 precision: str = "highest"):
        # 'highest' forces true-f32 MXU matmuls (bf16x6 passes).  JAX's
        # DEFAULT truncates f32 matmul inputs to bf16 on TPU, which
        # wrecks LU backward error (measured: refine-0 residual 2.5e-2
        # vs 2.5e-6, refinement rate 0.35/round vs terminal) for ~23%
        # speed.  Part of the jit trace context, so engines stay cached
        # per precision.
        self.precision = precision
        self.blocked = blocked
        self.schedule = schedule or build_schedule(blocked)
        self.backend = backend or get_backend(
            "auto", nb=blocked.nb, dtype=blocked.dtype)
        self.perf = perf or PerfCounters()
        if panel_solve not in ("inv", "trsm"):
            raise ValueError("panel_solve must be 'inv' or 'trsm'")
        self.panel_solve = panel_solve
        if dispatch == "auto":
            reason = ""
            if panel_solve != "inv":
                dispatch = "levels"
                reason = "trsm panel solves need per-level dispatch"
            elif self._dd_eligible():
                # r64 on TPU: double-float engine on the f32 MXU (the
                # emulated-f64 path is ~1000x slower)
                import os

                # NOTE: no backend-name gate — the f64 dtype resolves
                # to the jax backend in the registry (pallas registers
                # f32 only); the dd kernels pick their Pallas paths
                # internally, exactly like dispatch="dd" does
                if (self.blocked.nb in (128, 256)
                        and os.environ.get("PANGULU_TPU_DD_MEGA")
                        != "0"):
                    # single-launch dd mega kernel: removes the XLA
                    # fori per-level op-dispatch latency (~456 us/level
                    # measured at n=4096) exactly as the f32 mega does
                    dispatch = "dd_mega"
                    reason = ("f64 on TPU -> double-float f32 engine, "
                              "single-launch Pallas dd mega kernel")
                elif self._group_worthwhile():
                    dispatch = "dd_group"
                    reason = ("f64 on TPU -> double-float f32 engine, "
                              "batched super-level groups")
                else:
                    dispatch = "dd"
                    reason = "f64 on TPU -> double-float f32 engine"
            elif self._mega_eligible():
                if self._group_worthwhile():
                    dispatch = "mega_group"
                    reason = ("single-launch Pallas fast path, "
                              "batched super-level groups")
                else:
                    dispatch = "mega"
                    reason = "single-launch Pallas fast path"
            elif (self.schedule.fused_overhead()
                  <= self.FUSED_OVERHEAD_LIMIT):
                dispatch = "fused"
                reason = self._fallback_reason("fused")
            else:
                dispatch = "segmented"
                reason = self._fallback_reason("segmented (skewed levels)")
            log.info("engine: %s (%s)", dispatch, reason)
            # NOTE: dispatch="superfused" (etree super-level batching)
            # exists but is never auto-selected: measured slower than
            # both the mega kernel (on-chip) and the fused engine (CPU)
            # — batching pads more work than the per-step fixed costs
            # it amortizes at the XLA level.  The super-level schedule
            # analysis (Schedule.superlevels) is the input for a future
            # batched-diag MEGA variant (ROADMAP #1), where the per-
            # level costs are real (~40 us/level).
        self.dispatch = dispatch
        self._prepared = None
        self._fused_args = None
        self._segments = None
        self._super_segments = None
        self._mega = None
        self.inv_tiles = None  # [bl, 2, nb, nb] after a mega factorize
        if dispatch == "dd_mega":
            from pangulu_tpu.ops.kernels_pallas_dd import (DD_MAX_PCH,
                                                           DD_UCH)

            # ship tables to the device ONCE (numpy values would be
            # re-uploaded on every factorize call — measured as part
            # of a 22 ms/fact fixed cost on the tunnel, r5)
            self._mega = {
                k: (v if isinstance(v, int) else jnp.asarray(v))
                for k, v in self.schedule.mega_tables(
                    self.blocked.num_tiles, uch=DD_UCH,
                    max_pch=DD_MAX_PCH).items()}
        elif dispatch == "dd":
            self._fused_args = tuple(
                jnp.asarray(t) for t in
                self.schedule.fused_tables(self.blocked.num_tiles))
        elif dispatch == "dd_group":
            self._super_segments = [
                tuple(jnp.asarray(t) for t in seg)
                for seg in self.schedule.superfused_wave_tables(
                    self.blocked.num_tiles, gmax=self.GROUP_GMAX)]
        elif dispatch == "mega":
            from pangulu_tpu.ops.kernels_pallas import mega_uch

            # Super-level chain-ahead: MEASURED on v5e (r3) to give no
            # overlap — the Mosaic scheduler software-pipelines small
            # straight-line bodies (microbenchmarks showed VPU scans
            # hiding under MXU dots) but not the branchy update stream,
            # so interleaved chain scans serialize and add ~5us/chain
            # (smallworld(90): 5.66 -> 5.92 ms; poisson3d(32) nd:
            # 16.2 -> 17.0 ms).  The mechanism is kept correct+tested;
            # enable explicitly to re-evaluate on other TPU generations.
            import os

            depth = self.schedule.block_depths()
            use_super = (os.environ.get("PANGULU_TPU_SUPERLEVEL") == "1"
                         and (self.schedule.block_length
                              - int(depth.max(initial=0)) - 1) > 0)
            self._mega = {
                k: (v if isinstance(v, int) else jnp.asarray(v))
                for k, v in self.schedule.mega_tables(
                    self.blocked.num_tiles,
                    uch=mega_uch(self.blocked.nb),
                    superlevel=use_super).items()}
            if use_super:
                log.info("mega super-level pipeline: %d levels, %d "
                         "depths, %d chains run ahead",
                         self.schedule.block_length,
                         int(depth.max(initial=0)) + 1,
                         int(self._mega["flag_tab"].sum()))
        elif dispatch == "mega_group":
            from pangulu_tpu.ops.kernels_pallas import mega_uch

            self._mega = {
                k: (v if isinstance(v, int) else jnp.asarray(v))
                for k, v in self.schedule.group_mega_tables(
                    self.blocked.num_tiles,
                    uch=mega_uch(self.blocked.nb),
                    gmax=self.GROUP_GMAX).items()}
            log.info("mega batched groups: %d levels -> %d groups "
                     "(gmax=%d)", self.schedule.block_length,
                     self._mega["ngroups"], self._mega["gmax"])
        elif dispatch == "superfused":
            self._super_segments = [
                tuple(jnp.asarray(t) for t in seg)
                for seg in self.schedule.superfused_tables(
                    self.blocked.num_tiles)]
        elif dispatch == "fused":
            self._fused_args = tuple(
                jnp.asarray(t) for t in
                self.schedule.fused_tables(self.blocked.num_tiles))
        elif dispatch == "segmented":
            self._segments = [
                tuple(jnp.asarray(t) for t in seg)
                for seg in self.schedule.segmented_tables(
                    self.blocked.num_tiles)]
        else:
            self._prepared = self._prepare_levels()

    def _fallback_reason(self, engine: str) -> str:
        """Explain WHY the Pallas fast path was not taken — a silent
        4-5x slowdown (e.g. nb!=128 r32 on chip) is a perf mystery;
        one log line per dispatch prevents it."""
        if jax.default_backend() != "tpu":
            return f"{engine}; not on a TPU backend"
        if self.backend.name != "pallas":
            return f"{engine}; backend={self.backend.name} (not pallas)"
        why = []
        if jnp.dtype(self.blocked.dtype) != jnp.float32:
            why.append(f"dtype={jnp.dtype(self.blocked.dtype).name}!=f32")
        if self.blocked.nb not in (128, 256):
            why.append(f"nb={self.blocked.nb} not in (128, 256)")
        return (f"{engine}; mega ineligible: " + ", ".join(why)
                if why else engine)

    # Batched-group kernel batch cap: bounds fb3/linv3/uinv3 VMEM
    # (3 * GMAX * nb^2 * 4B = 3 MB at 16/128) and the batched-scan VPU
    # width.  Groups wider than this split (members stay independent).
    GROUP_GMAX = 16

    def _group_worthwhile(self) -> bool:
        """Batched super-level groups pay when they meaningfully shrink
        the sequential group count vs per-level chains: each group
        replaces G per-level fixed costs (~35 us measured:
        tools/exp_mega_phases.py chains_only) with one.  Chain-type
        schedules (RCM bands: every level depends on its predecessor)
        compress nothing and stay on the chain kernel.  Override via
        PANGULU_TPU_GROUP=0/1."""
        import os

        env = os.environ.get("PANGULU_TPU_GROUP")
        if env is not None:
            return env == "1"
        bl = self.schedule.block_length
        ng = sum(-(-len(m) // self.GROUP_GMAX)
                 for m in self.schedule.superlevels())
        return bl >= 1.5 * ng

    def _dd_eligible(self) -> bool:
        """r64/cr64-embedded on a real TPU runs the double-float engine
        (emulated f64 on TPU is ~1000x slower than f32; the dd engine
        keeps all FLOPs on the f32 MXU/VPU at ~48-bit precision).

        nb gate: dd_matmul's exact-slicing guarantee needs
        2*WBITS + log2(K) <= 24 for the contraction dim K = nb, i.e.
        nb <= 256 — beyond that, slice-product accumulation rounds and
        the promised precision silently degrades."""
        if (jnp.dtype(self.blocked.dtype) != jnp.float64
                or jax.default_backend() != "tpu"):
            return False
        if self.blocked.nb > 256:
            log.info("engine: dd ineligible at nb=%d (>256 breaks the "
                     "exact-slice accumulation bound) — falling back to "
                     "the emulated-f64 XLA engine, which is very slow "
                     "on TPU; prefer nb<=256 for r64", self.blocked.nb)
            return False
        return True

    def _mega_eligible(self) -> bool:
        """The single-launch Pallas mega-kernel handles f32 tiles with
        nb=128 or nb=256 (the reference default, pangulu.c:52-56) and
        panels of any width (VMEM-chunked); it is the fast path on a
        real TPU (per-level pallas_call launch overhead is ~124us —
        83% of wall time on the bench problem)."""
        if self.backend.name != "pallas":
            return False
        if jax.default_backend() != "tpu":
            return False  # interpret-mode mega runs only when forced
        return (jnp.dtype(self.blocked.dtype) == jnp.float32
                and self.blocked.nb in (128, 256))

    def _prepare_levels(self):
        """Host-side: bucket-pad every level's index arrays once."""
        scratch = self.blocked.num_tiles  # the scratch tile id
        prepared = []
        for lev in self.schedule.levels:
            nl = bucket(len(lev.lpanel))
            nu = bucket(len(lev.upanel))
            nup = bucket(len(lev.upd_dst))
            prepared.append((
                np.array([lev.diag], dtype=np.int32),
                pad_ids(lev.lpanel, nl, scratch),
                pad_ids(lev.upanel, nu, scratch),
                pad_ids(lev.upd_dst, nup, scratch),
                pad_ids(lev.upd_l, nup, 0),
                pad_ids(lev.upd_u, nup, 0),
            ))
        return prepared

    def factorize(self, tiles=None, sync=True):
        """Run the factorization; returns factored tiles (device array,
        L\\U packed per tile).

        ``sync=False`` skips the completion readback (a full tunnel
        round trip, ~26 ms on this environment) — used by bench.py to
        measure steady-state throughput over K chained runs with one
        final sync.  The returned tiles are a valid async value either
        way.
        """
        if self.dispatch in ("dd", "dd_group", "dd_mega"):
            from pangulu_tpu.ops.kernels_jax import DEFAULT_TOL

            if isinstance(tiles, DdTiles):
                th, tl = tiles.hi, tiles.lo
            else:
                # split f64 host tiles into hi/lo f32 pairs; only f32
                # ever reaches the device
                with self.perf.phase("preprocess"):
                    host = self.blocked.tiles
                    hi = host.astype(np.float32)
                    lo = (host - hi.astype(np.float64)).astype(np.float32)
                    th = device_sync(jnp.asarray(hi))
                    tl = jnp.asarray(lo)
            tol = (self.backend.tol if self.backend.tol is not None
                   else float(DEFAULT_TOL[jnp.dtype(np.float64)]))
            with self.perf.phase("numeric"):
                if self.dispatch == "dd_mega":
                    from pangulu_tpu.ops.kernels_pallas_dd import (
                        mega_factorize_dd,
                    )

                    th, tl, invh, invl = mega_factorize_dd(
                        th, tl, self._mega, nb=self.blocked.nb,
                        tol=tol, bl=self.schedule.block_length)
                elif self.dispatch == "dd_group":
                    # +1 scratch inverse row for padding group members
                    nb = self.blocked.nb
                    invh = jnp.zeros(
                        (self.schedule.block_length + 1, 2, nb, nb),
                        jnp.float32)
                    invl = jnp.zeros_like(invh)
                    for seg in self._super_segments:
                        th, tl, invh, invl = _group_factorize_dd(
                            nb, tol, th, tl, invh, invl, *seg)
                    invh, invl = invh[:-1], invl[:-1]
                else:
                    th, tl, invh, invl = _fused_factorize_dd(
                        self.blocked.nb, tol, th, tl, *self._fused_args)
                if sync:
                    th = device_sync(th)
            self.inv_tiles = (invh, invl)
            self.perf.add_flops(self.schedule.flop_estimate())
            self.perf.kernel_counts(
                getrf=self.schedule.block_length,
                tstrf=self.schedule.n_tstrf,
                gessm=self.schedule.n_gessm,
                ssssm=self.schedule.n_ssssm,
            )
            return DdTiles(th, tl)
        if tiles is None:
            # H2D of the tile store counts as preprocessing (the
            # reference scatters blocks in pangulu_preprocessing, not
            # in the numeric phase) — and the transfer is async, so it
            # must complete before the numeric timer starts.
            with self.perf.phase("preprocess"):
                tiles = device_sync(self.blocked.device_tiles())
        if self.dispatch == "mega_group":
            from pangulu_tpu.ops.kernels_jax import DEFAULT_TOL
            from pangulu_tpu.ops.kernels_pallas import (
                mega_factorize_groups,
            )

            t = self._mega
            mtol = (self.backend.tol if self.backend.tol is not None
                    else float(DEFAULT_TOL[jnp.dtype(self.blocked.dtype)]))
            with self.perf.phase("numeric"):
                tiles, self.inv_tiles = mega_factorize_groups(
                    tiles, t["gs_tab"], t["nup_tab"], t["gdiag_tab"],
                    t["glev_tab"], t["gloff_tab"], t["guoff_tab"],
                    t["lid_tab"], t["uid_tab"], t["udst_tab"],
                    t["udl_tab"], t["udu_tab"],
                    nb=self.blocked.nb, tol=mtol, ng=t["ngroups"],
                    gmax=t["gmax"], pch=t["pch"], uch=t["uch"],
                    bl=self.schedule.block_length)
                if sync:
                    tiles = device_sync(tiles)
            self.perf.add_flops(self.schedule.flop_estimate())
            self.perf.kernel_counts(
                getrf=self.schedule.block_length,
                tstrf=self.schedule.n_tstrf,
                gessm=self.schedule.n_gessm,
                ssssm=self.schedule.n_ssssm,
            )
            return tiles
        if self.dispatch == "mega":
            from pangulu_tpu.ops.kernels_jax import DEFAULT_TOL
            from pangulu_tpu.ops.kernels_pallas import mega_factorize

            t = self._mega
            mtol = (self.backend.tol if self.backend.tol is not None
                    else float(DEFAULT_TOL[jnp.dtype(self.blocked.dtype)]))
            with self.perf.phase("numeric"):
                tiles, self.inv_tiles = mega_factorize(
                    tiles, t["diag_tab"], t["nl_tab"], t["nu_tab"],
                    t["nup_tab"], t["lid_tab"], t["uid_tab"],
                    t["udst_tab"], t["udl_tab"], t["udu_tab"],
                    t.get("flag_tab"), t.get("lev_tab"),
                    nb=self.blocked.nb, tol=mtol,
                    bl=self.schedule.block_length, pch=t["pch"],
                    uch=t["uch"])
                if sync:
                    tiles = device_sync(tiles)
            self.perf.add_flops(self.schedule.flop_estimate())
            self.perf.kernel_counts(
                getrf=self.schedule.block_length,
                tstrf=self.schedule.n_tstrf,
                gessm=self.schedule.n_gessm,
                ssssm=self.schedule.n_ssssm,
            )
            return tiles
        if self.dispatch in ("fused", "segmented", "superfused"):
            ctx = jax.default_matmul_precision(self.precision)
            with self.perf.phase("numeric"), ctx:
                if self.dispatch == "fused":
                    tiles = _fused_factorize(self.backend, tiles,
                                             *self._fused_args)
                elif self.dispatch == "superfused":
                    for seg in self._super_segments:
                        tiles = _superfused_factorize(self.backend,
                                                      tiles, *seg)
                else:
                    for seg in self._segments:
                        tiles = _fused_factorize(self.backend, tiles, *seg)
                if sync:
                    tiles = device_sync(tiles)
            self.perf.add_flops(self.schedule.flop_estimate())
            self.perf.kernel_counts(
                getrf=self.schedule.block_length,
                tstrf=self.schedule.n_tstrf,
                gessm=self.schedule.n_gessm,
                ssssm=self.schedule.n_ssssm,
            )
            return tiles
        use_inv = self.panel_solve == "inv"
        ctx = jax.default_matmul_precision(self.precision)
        with self.perf.phase("numeric"), ctx:
            for (diag_idx, l_ids, u_ids, dst, lsel, usel) in self._prepared:
                if use_inv:
                    tiles, linv, uinv = _diag_step(self.backend, tiles,
                                                   diag_idx)
                    tiles = _panel_schur_step(
                        self.backend, tiles, linv, uinv,
                        l_ids, u_ids, dst, lsel, usel)
                else:
                    diag = None
                    tiles, linv, uinv = _diag_step(self.backend, tiles,
                                                   diag_idx)
                    diag = tiles[diag_idx[0]]
                    tiles = _panel_schur_step_trsm(
                        self.backend, tiles, diag,
                        l_ids, u_ids, dst, lsel, usel)
            tiles = device_sync(tiles)
        self.perf.add_flops(self.schedule.flop_estimate())
        self.perf.kernel_counts(
            getrf=self.schedule.block_length,
            tstrf=self.schedule.n_tstrf,
            gessm=self.schedule.n_gessm,
            ssssm=self.schedule.n_ssssm,
        )
        return tiles
