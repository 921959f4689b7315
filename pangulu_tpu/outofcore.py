"""Out-of-core panel factorization: O(fill) memory at mega-kernel speed.

The reference's storage is universally O(fill) (pangulu_storage.c:83-293)
while this repo's fast path keeps O(tiles*nb^2) dense tiles in HBM —
capping single-chip problem size.  This driver removes the cap
RIGHT-LOOKING AT PANEL GRANULARITY:

  * the factor lives in the compressed u16-slot store
    (:class:`~pangulu_tpu.compressed.CompressedTiles`) — O(fill-nnz);
  * block columns are processed in PANELS of ``panel_width`` columns;
    the panel's CROSS (tiles with block-row or block-col in the panel)
    is densified (one batched XLA gather), factored by the Pallas
    mega-kernel (same engine, sub-schedule tables, super-level
    pipelining included), and compressed back;
  * the panel's Schur updates to tiles OUTSIDE the cross are batched
    dense matmuls whose per-destination sums are scatter-SUBTRACTED
    into the compressed store in bounded-memory chunks.

Only the cross + one update chunk are ever dense, so the dense
working set is O(cross) regardless of problem size, while all FLOPs
still run through the mega kernel / MXU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from pangulu_tpu.blocks import BlockedMatrix
from pangulu_tpu.compressed import CompressedTiles
from pangulu_tpu.ops.interface import KernelBackend, get_backend
from pangulu_tpu.schedule import Level, Schedule, bucket, build_schedule
from pangulu_tpu.sparse import CscMatrix
from pangulu_tpu.utils import device_sync
from pangulu_tpu.utils.log import get_logger
from pangulu_tpu.utils.perf import PerfCounters

log = get_logger()


# ---------------------------------------------------------------------------
# jitted store <-> dense staging (shapes keyed on capmax / tile counts)
# ---------------------------------------------------------------------------


def _gather_core(values, idx, off, cap, ids, *, nb, capmax):
    """Compressed slots of tiles ``ids`` -> dense [len(ids), nb, nb]."""
    nn = nb * nb
    ar = jnp.arange(capmax)
    pos = off[ids][:, None] + ar[None, :]
    mask = ar[None, :] < cap[ids][:, None]
    v = jnp.where(mask, values[pos], 0)
    ix = jnp.where(mask, idx[pos].astype(jnp.int32), nn)
    b = ids.shape[0]
    dense = jnp.zeros((b, nn + 1), values.dtype)
    dense = dense.at[jnp.arange(b)[:, None], ix].set(v)
    return dense[:, :nn].reshape(b, nb, nb)


@functools.partial(jax.jit, static_argnames=("nb", "capmax"))
def _gather_dense(values, idx, off, cap, ids, *, nb, capmax):
    """Compressed slots of tiles ``ids`` -> dense [len(ids)+1, nb, nb]
    (last tile = zero scratch)."""
    b = ids.shape[0]
    out = jnp.zeros((b + 1, nb, nb), values.dtype)
    return out.at[:b].set(
        _gather_core(values, idx, off, cap, ids, nb=nb, capmax=capmax))


@functools.partial(jax.jit, static_argnames=("nb", "capmax"),
                   donate_argnums=(0,))
def _gather_slab_into(dense, values, idx, off, cap, ids, s, *, nb, capmax):
    """Gather one slab of tiles into rows [s, s+slab) of the
    preallocated cross buffer IN PLACE (donated) — the previous
    parts-list + concatenate staging kept a SECOND cross-sized
    temporary alive, which is what pushed the >16 GB demo over HBM."""
    part = _gather_core(values, idx, off, cap, ids, nb=nb, capmax=capmax)
    return jax.lax.dynamic_update_slice_in_dim(dense, part, s, axis=0)


@functools.partial(jax.jit, static_argnames=("nb", "capmax"),
                   donate_argnums=(0,))
def _scatter_dense(values, idx, off, cap, ids, dense, scratch, *, nb,
                   capmax):
    """Write dense tiles back into their compressed slots (positions
    outside each tile's pattern are exact zeros — the superset-pattern
    invariant — so dropping them loses nothing)."""
    nn = nb * nb
    ar = jnp.arange(capmax)
    b = ids.shape[0]
    pos = off[ids][:, None] + ar[None, :]
    mask = ar[None, :] < cap[ids][:, None]
    ix = idx[pos].astype(jnp.int32)
    v = dense[:b].reshape(b, nn)[jnp.arange(b)[:, None],
                                 jnp.minimum(ix, nn - 1)]
    tgt = jnp.where(mask, pos, scratch)
    return values.at[tgt].set(jnp.where(mask, v, 0))


@functools.partial(jax.jit, static_argnames=("nb", "capw", "nacc"),
                   donate_argnums=(0,))
def _apply_out_updates(values, idx, off, cap, cross, l_sel, u_sel,
                       acc_sel, dst_ids, *, nb, capw, nacc):
    """One chunk of out-of-cross Schur updates: batched MXU products
    from the factored cross, per-destination accumulation, then a
    gather-subtract-scatter on the compressed slots.

    l_sel/u_sel: [NU] cross-local tile indices; acc_sel: [NU] index of
    each update's destination within this chunk's unique-dst list;
    dst_ids: [nacc] GLOBAL tile ids (pad: scratch tile, cap 0).

    ``capw`` is the CHUNK's slot width — the chunk builder groups
    destinations into power-of-two capacity classes (the reference's
    geometric storage bins, pangulu_preprocessing.c:325-332) so the
    gather/scatter traffic scales with each tile's ACTUAL fill, not
    the global capmax: this phase is HBM-bandwidth-bound at demo
    scale, and most tiles carry far less than capmax entries."""
    dt = values.dtype
    prod = jnp.matmul(cross[l_sel], cross[u_sel],
                      preferred_element_type=dt,
                      precision=jax.lax.Precision.HIGHEST)
    acc = jnp.zeros((nacc, nb, nb), dt).at[acc_sel].add(prod)
    nn = nb * nb
    ar = jnp.arange(capw)
    pos = off[dst_ids][:, None] + ar[None, :]
    mask = ar[None, :] < cap[dst_ids][:, None]
    ix = idx[pos].astype(jnp.int32)
    cur = jnp.where(mask, values[pos], 0)
    upd = acc.reshape(nacc, nn)[jnp.arange(nacc)[:, None],
                                jnp.minimum(ix, nn - 1)]
    scratch = off[-1]     # off[nt] = scratch region start
    tgt = jnp.where(mask, pos, scratch)
    return values.at[tgt].set(jnp.where(mask, cur - upd, 0))


def _hbm_note() -> str:
    """Best-effort device-memory annotation for panel progress lines
    (not all backends expose memory_stats; the axon tunnel does)."""
    try:
        ms = jax.devices()[0].memory_stats() or {}
        used = ms.get("bytes_in_use")
        peak = ms.get("peak_bytes_in_use")
        if used is None:
            return ""
        note = f"; hbm {used / 2 ** 30:.2f} GiB"
        if peak is not None:
            note += f" (peak {peak / 2 ** 30:.2f})"
        return note
    except Exception:
        return ""


# ---------------------------------------------------------------------------
# the panel driver
# ---------------------------------------------------------------------------


class PanelLU:
    """gstrf/gstrs executor: compressed at rest, mega-kernel per panel.

    ``panel_width``: block columns per panel (the dense working set is
    the panel CROSS; None = auto from a ~2 GB dense-cross budget).
    ``out_chunk``: max Schur updates staged dense at once."""

    def __init__(self, blocked: BlockedMatrix, schedule: Schedule | None,
                 a3: CscMatrix, backend: KernelBackend | None = None,
                 perf: PerfCounters | None = None,
                 panel_width: int | None = None,
                 out_chunk: int = 2048, store=None):
        self.blocked = blocked
        self.schedule = schedule or build_schedule(blocked)
        self.backend = backend or get_backend(
            "auto", nb=blocked.nb, dtype=blocked.dtype)
        self.perf = perf or PerfCounters()
        self.out_chunk = out_chunk
        with self.perf.phase("preprocess"):
            if store is not None:      # refactorize: same pattern,
                store.refill(a3)       # new values — O(nnz)
                self.store = store
            else:
                self.store = CompressedTiles(blocked, a3)
        bl, nb = self.schedule.block_length, blocked.nb
        if panel_width is None:
            budget = int(float(os.environ.get(
                "PANGULU_OOC_PANEL_GB", "2")) * 2 ** 30)
            per_col = (max(1, self.blocked.num_tiles // max(bl, 1))
                       * 2 * nb * nb
                       * np.dtype(blocked.dtype).itemsize)
            panel_width = int(min(max(budget // max(per_col, 1), 4), bl))
        self.panel_width = panel_width
        # inverse store for the solve (dense, [bl, 2, nb, nb]);
        # per-panel inverse outputs stay ON DEVICE during the loop
        # (a host readback here costs a full ~26 ms tunnel RTT *and*
        # stalls the dispatch pipeline once per panel) and are
        # concatenated after the last panel.
        self.inv_tiles = None
        self._inv_parts: list = []
        # per-tile block coords
        nt = blocked.num_tiles
        self._rows = np.empty(nt, dtype=np.int64)
        self._cols = np.empty(nt, dtype=np.int64)
        for bj in range(bl):
            lo, hi = blocked.bcolptr[bj], blocked.bcolptr[bj + 1]
            self._rows[lo:hi] = blocked.browidx[lo:hi]
            self._cols[lo:hi] = bj

    # -- panel pass --------------------------------------------------------

    def _stage_slab(self) -> int:
        """Tiles per gather/scatter slab: XLA staging temporaries run
        ~slab * capmax * 16 B; bound them to ~2 GiB (capmax reaches
        nb^2 when supernodes densify)."""
        budget = int(float(os.environ.get(
            "PANGULU_OOC_STAGE_GB", "2")) * 2 ** 30)
        return int(min(max(budget // max(self.store.capmax * 16, 1),
                           256), 1 << 15))

    def _cross_ids(self, c0, c1):
        in_col = (self._cols >= c0) & (self._cols < c1)
        in_row = (self._rows >= c0) & (self._rows < c1)
        return np.flatnonzero(in_col | in_row)

    def _dense_budget_tiles(self) -> int:
        """Max tiles one dense panel cross may occupy.

        ``panel_width`` is sized from the AVERAGE tiles per block
        column, but real crosses vary by orders of magnitude across
        panels (separator-heavy panels of an ND ordering) — the >16 GB
        demo OOM'd when one cross hit 7 GiB on top of a ~10 GiB
        compressed store.  The budget is derived from the ACTUAL HBM
        limit minus what the run already holds: the compressed store,
        the gather/scatter staging temporaries (~= the stage budget),
        and a fixed spare for the collected inverse panels, out-update
        chunks and allocator fragmentation."""
        nb = self.blocked.nb
        tile_b = nb * nb * np.dtype(self.blocked.dtype).itemsize
        env = os.environ.get("PANGULU_OOC_CROSS_GB")
        if env is not None:
            return max(int(float(env) * 2 ** 30 // tile_b), 64)
        hbm = 15.0 * 2 ** 30
        try:
            ms = jax.devices()[0].memory_stats() or {}
            hbm = float(ms.get("bytes_limit") or hbm)
        except Exception:
            pass
        stage_b = int(float(os.environ.get(
            "PANGULU_OOC_STAGE_GB", "2")) * 2 ** 30)
        spare = 2 * 2 ** 30
        free = hbm - self.store.compressed_bytes - stage_b - spare
        return max(int(free // tile_b), 64)

    def _sub_schedule(self, c0, c1, local_of):
        """Mini Schedule over the panel's levels with CROSS-local tile
        ids; returns (schedule, out_updates) where out_updates is the
        list of (dst_global, l_local_cross, u_local_cross)."""
        levels = []
        out_dst, out_l, out_u = [], [], []
        for k in range(c0, c1):
            lev = self.schedule.levels[k]
            dst_loc = local_of[lev.upd_dst]
            keep = dst_loc >= 0
            lpan_loc = local_of[lev.lpanel]
            upan_loc = local_of[lev.upanel]
            assert (lpan_loc >= 0).all() and (upan_loc >= 0).all()
            # out-of-cross updates: resolved AFTER the panel factors,
            # via the factored cross panels
            if (~keep).any():
                out_dst.append(lev.upd_dst[~keep])
                out_l.append(lpan_loc[lev.upd_l[~keep]])
                out_u.append(upan_loc[lev.upd_u[~keep]])
            # in-panel dependency view for super-level depths
            above = lev.ucolrows >= c0
            levels.append(Level(
                k=k - c0, diag=int(local_of[lev.diag]),
                lpanel=lpan_loc, lrows=lev.lrows,
                upanel=upan_loc, ucols=lev.ucols,
                upd_dst=dst_loc[keep],
                upd_l=lev.upd_l[keep], upd_u=lev.upd_u[keep],
                ucolpanel=local_of[lev.ucolpanel[above]],
                ucolrows=lev.ucolrows[above] - c0,
            ))
        sub = Schedule(block_length=c1 - c0, nb=self.schedule.nb,
                       levels=levels,
                       n_tstrf=sum(len(l.lpanel) for l in levels),
                       n_gessm=sum(len(l.upanel) for l in levels),
                       n_ssssm=sum(len(l.upd_dst) for l in levels))

        def _cat(arrs):
            return (np.concatenate(arrs) if arrs
                    else np.empty(0, dtype=np.int64))

        return sub, (_cat(out_dst), _cat(out_l), _cat(out_u))

    def _panel_pass(self, c0, c1):
        from pangulu_tpu.ops.kernels_jax import DEFAULT_TOL
        from pangulu_tpu.ops.kernels_pallas import (mega_factorize,
                                                    mega_uch)

        st = self.store
        nb = st.nb
        cross = self._cross_ids(c0, c1)
        log.info("panel cols [%d,%d): cross %d tiles (%.2f GiB dense)",
                 c0, c1, len(cross),
                 len(cross) * nb * nb
                 * np.dtype(self.blocked.dtype).itemsize / 2 ** 30)
        local_of = np.full(self.blocked.num_tiles + 1, -1, dtype=np.int64)
        local_of[cross] = np.arange(len(cross))
        sub, (odst, olsel, ousel) = self._sub_schedule(c0, c1, local_of)

        # 1. densify the cross in SLABS: one monolithic gather
        # materializes ~slab x capmax x 16 B of XLA temporaries (pos /
        # mask / gathered values / scattered dense), which at dense-
        # supernode capmax (nb^2) and a 32k-tile cross exceeds HBM —
        # the slab bounds the staging working set to ~2 GiB.  Pad tiles
        # = scratch tile, cap 0 -> zero tiles; padding to a multiple of
        # the slab keeps the gather jit-cached on one shape.
        slab = self._stage_slab()
        npad = max(-(-max(len(cross), 1) // slab) * slab, slab)
        ids_p = np.full(npad, st.num_tiles, dtype=np.int32)
        ids_p[: len(cross)] = cross
        if npad <= slab:
            dense = _gather_dense(st.values, st.idx, st.off, st.cap,
                                  jnp.asarray(ids_p), nb=nb,
                                  capmax=st.capmax)
        else:
            dense = jnp.zeros((npad + 1, nb, nb), st.values.dtype)
            for s in range(0, npad, slab):
                dense = _gather_slab_into(
                    dense, st.values, st.idx, st.off, st.cap,
                    jnp.asarray(ids_p[s:s + slab]), np.int32(s),
                    nb=nb, capmax=st.capmax)
        # compact view for the kernel: [bucket(len(cross))+1, nb, nb];
        # the kernel's scratch-tile convention = the LAST slot (pad
        # tiles in between are zero, gathered from zero-cap scratch)
        scratch_local = dense.shape[0] - 1

        # 2. mega factorize the cross sub-problem (chain-ahead off by
        # default — measured no overlap on v5e; opt in via env)
        t = sub.mega_tables(
            scratch_local, uch=mega_uch(nb),
            superlevel=os.environ.get("PANGULU_TPU_SUPERLEVEL") == "1")
        mtol = (self.backend.tol if self.backend.tol is not None
                else float(DEFAULT_TOL[jnp.dtype(self.blocked.dtype)]))
        dense, invs = mega_factorize(
            dense, *(jnp.asarray(t[k]) for k in
                     ("diag_tab", "nl_tab", "nu_tab", "nup_tab",
                      "lid_tab", "uid_tab", "udst_tab", "udl_tab",
                      "udu_tab")),
            None if "flag_tab" not in t else jnp.asarray(t["flag_tab"]),
            None if "lev_tab" not in t else jnp.asarray(t["lev_tab"]),
            nb=nb, tol=mtol, bl=c1 - c0, pch=t["pch"], uch=t["uch"])
        self._inv_parts.append(invs)

        # 3. out-of-cross Schur updates, chunked by destination groups.
        # Destinations are partitioned into power-of-two CAPACITY
        # CLASSES first: the scatter traffic of a chunk is
        # nacc x class-width, so slots ride a width sized to their
        # actual fill instead of the global capmax (~2x less HBM
        # traffic at demo scale, where this phase is bandwidth-bound).
        if len(odst):
            order = np.argsort(odst, kind="stable")
            odst, olsel, ousel = odst[order], olsel[order], ousel[order]
            starts = np.flatnonzero(np.r_[True, odst[1:] != odst[:-1]])
            bounds = np.r_[starts, len(odst)]
            gcap = st.host_cap[odst[starts]]
            # class width per dst group: next pow2 >= cap, floor 1024
            # (fewer distinct widths -> fewer jit entries)
            gcls = np.maximum(
                2 ** np.ceil(np.log2(np.maximum(gcap, 1))).astype(
                    np.int64), 1024)
            gcls = np.minimum(gcls, st.capmax)
            for capw in np.unique(gcls):
                sel_g = np.flatnonzero(gcls == capw)
                i = 0
                while i < len(sel_g):
                    j, tot = i, 0
                    while j < len(sel_g) and (
                            j == i
                            or tot + bounds[sel_g[j] + 1]
                            - bounds[sel_g[j]] <= self.out_chunk):
                        tot += bounds[sel_g[j] + 1] - bounds[sel_g[j]]
                        j += 1
                    gs = sel_g[i:j]
                    upd = np.concatenate(
                        [np.arange(bounds[g], bounds[g + 1])
                         for g in gs])
                    nupd = bucket(len(upd))
                    nacc = bucket(len(gs))
                    l_sel = np.full(nupd, len(cross), dtype=np.int32)
                    u_sel = np.full(nupd, len(cross), dtype=np.int32)
                    acc_sel = np.full(nupd, nacc - 1, dtype=np.int32)
                    l_sel[: len(upd)] = olsel[upd]
                    u_sel[: len(upd)] = ousel[upd]
                    acc_sel[: len(upd)] = np.searchsorted(
                        odst[starts[gs]], odst[upd])
                    dst_ids = np.full(nacc, st.num_tiles,
                                      dtype=np.int32)
                    dst_ids[: len(gs)] = odst[starts[gs]]
                    # padded update rows: scratch-cross tiles are zero
                    # -> zero products accumulated into the padded slot
                    st.values = _apply_out_updates(
                        st.values, st.idx, st.off, st.cap, dense,
                        jnp.asarray(l_sel), jnp.asarray(u_sel),
                        jnp.asarray(acc_sel), jnp.asarray(dst_ids),
                        nb=nb, capw=int(capw), nacc=nacc)
                    i = j

        # 4. compress the factored cross back into the store (same
        # slabbing as the gather: bounded staging temporaries)
        for s in range(0, npad, slab):
            st.values = _scatter_dense(
                st.values, st.idx, st.off, st.cap,
                jnp.asarray(ids_p[s:s + slab]),
                jax.lax.dynamic_slice_in_dim(dense, s, slab),
                st.scratch_slot, nb=nb, capmax=st.capmax)

    def factorize(self):
        import time as _time

        bl = self.schedule.block_length
        w = self.panel_width
        budget = self._dense_budget_tiles()
        self._inv_parts = []
        self.panel_cols: list = []   # [(c0, c1)] actually executed
        t0 = _time.perf_counter()
        with self.perf.phase("numeric"):
            c0, npanel = 0, 0
            while c0 < bl:
                # HBM-aware split: halve the width until this panel's
                # MEASURED cross fits the dense budget (halving — not
                # arbitrary shrinking — keeps the set of panel lengths
                # small so Mosaic compiles of the sub-problem kernel
                # stay cached across panels)
                wc = min(w, bl - c0)
                while (wc > 1
                       and len(self._cross_ids(c0, c0 + wc)) > budget):
                    wc = (wc + 1) // 2
                if wc == 1 and len(self._cross_ids(c0, c0 + 1)) > budget:
                    log.warning(
                        "panel col %d: single-column cross exceeds the "
                        "%d-tile dense budget — proceeding (may OOM)",
                        c0, budget)
                self._panel_pass(c0, c0 + wc)
                self.panel_cols.append((c0, c0 + wc))
                npanel += 1
                log.info("panel %d (cols %d-%d of %d) dispatched "
                         "(%.1fs elapsed)%s", npanel, c0, c0 + wc, bl,
                         _time.perf_counter() - t0, _hbm_note())
                c0 += wc
            self.store.values = device_sync(self.store.values)
        self.inv_tiles = (jnp.concatenate(self._inv_parts)
                          if len(self._inv_parts) > 1
                          else self._inv_parts[0])
        self._inv_parts = []
        self.perf.add_flops(self.schedule.flop_estimate())
        self.perf.kernel_counts(
            getrf=bl, tstrf=self.schedule.n_tstrf,
            gessm=self.schedule.n_gessm, ssssm=self.schedule.n_ssssm)
        log.info("panel out-of-core: %d panels (width <= %d, cross "
                 "budget %d tiles); compressed store %.1f MiB vs "
                 "%.1f MiB dense (%.1fx)",
                 npanel, w, budget,
                 self.store.compressed_bytes / 2 ** 20,
                 self.store.dense_bytes / 2 ** 20,
                 self.store.dense_bytes
                 / max(self.store.compressed_bytes, 1))
        return self.store

    # -- solve -------------------------------------------------------------

    def solve(self, b: np.ndarray) -> np.ndarray:
        """Compressed-store solve against the collected inverses."""
        from pangulu_tpu.compressed import CompressedLU

        if getattr(self, "_clu", None) is None:
            self._clu = CompressedLU.from_store(
                self.blocked, self.schedule, self.store,
                backend=self.backend, perf=self.perf)
            self._clu.inv_tiles = self.inv_tiles
        return self._clu.solve(b)
