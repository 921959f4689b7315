"""Distributed 2D block-cyclic numeric factorization (multi-chip).

TPU-native re-expression of the reference's distributed numeric engine
(pangulu_numeric.c + pangulu_communication.c): blocks live sharded over
a ``Mesh(('gp','gq'))`` in 2D block-cyclic layout (owner of block (i,j)
is mesh coord (i%p, j%q), matching PANGULU_CALC_RANK,
pangulu_common.h:135).  Per elimination level, inside one ``shard_map``:

  1. the diag owner contributes tile (k,k) to a masked ``psum`` over
     both axes (the collective replacement for the reference's
     isend-of-diag-halves fan-out, pangulu_numeric.c:718-767); every
     device then runs GETRF + triangle inversion redundantly (nb^3
     work — cheaper than a second broadcast round);
  2. grid-column (.,k%q) devices panel-solve their L blocks, grid-row
     (k%p,.) devices their U blocks, as batched MXU matmuls against the
     inverses; results are written back locally and shared with a
     masked ``psum`` along 'gq' (L panel) / 'gp' (U panel) — each
     device receives exactly the panel rows/cols it owns updates for;
  3. every device scatter-adds its local batch of Schur updates.

All device-dependent control (slots, panel positions, masks) is passed
as ``[p, q, ...]``-shaped index tables sharded over the mesh, so the
compiled program is identical on every device — the SPMD analogue of
the reference's per-rank dependency metadata
(pangulu_preprocessing.c:393-441).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pangulu_tpu.blocks import BlockedMatrix
from pangulu_tpu.ops.interface import KernelBackend, get_backend
from pangulu_tpu.schedule import Schedule, build_schedule
from pangulu_tpu.utils import device_sync
from pangulu_tpu.utils.perf import PerfCounters


@dataclasses.dataclass
class DistLayout:
    """Host-side block-cyclic placement of tiles onto the mesh."""

    p: int
    q: int
    lmax: int                 # local slots per device (incl scratch)
    tile_owner_r: np.ndarray  # (num_tiles,)
    tile_owner_c: np.ndarray
    tile_slot: np.ndarray     # (num_tiles,) local slot on owner


def build_layout(blocked: BlockedMatrix, p: int, q: int) -> DistLayout:
    nt = blocked.num_tiles
    rows = np.empty(nt, dtype=np.int64)
    cols = np.empty(nt, dtype=np.int64)
    for bj in range(blocked.block_length):
        lo, hi = blocked.bcolptr[bj], blocked.bcolptr[bj + 1]
        rows[lo:hi] = blocked.browidx[lo:hi]
        cols[lo:hi] = bj
    owner_r = (rows % p).astype(np.int32)
    owner_c = (cols % q).astype(np.int32)
    slot = np.zeros(nt, dtype=np.int32)
    counts = np.zeros((p, q), dtype=np.int64)
    for t in range(nt):
        r, c = owner_r[t], owner_c[t]
        slot[t] = counts[r, c]
        counts[r, c] += 1
    lmax = int(counts.max()) + 1  # +1 scratch slot per device
    return DistLayout(p=p, q=q, lmax=lmax, tile_owner_r=owner_r,
                      tile_owner_c=owner_c, tile_slot=slot)


def scatter_tiles(blocked: BlockedMatrix, layout: DistLayout) -> np.ndarray:
    """[p, q, lmax, nb, nb] host array in block-cyclic layout."""
    p, q, lmax = layout.p, layout.q, layout.lmax
    nb = blocked.nb
    out = np.zeros((p, q, lmax, nb, nb), dtype=blocked.dtype)
    out[layout.tile_owner_r, layout.tile_owner_c, layout.tile_slot] = \
        blocked.tiles[: blocked.num_tiles]
    return out


def scatter_tiles_shard(blocked: BlockedMatrix, layout: DistLayout,
                        r: int, c: int) -> np.ndarray:
    """One device's [1, 1, lmax, nb, nb] shard, built directly from the
    O(nnz) scatter plan — no host materialization of other devices'
    tiles (multi-host path: each process builds only its own shards,
    replacing the reference's rank-0 Isend scatter,
    pangulu_communication.c:227-761)."""
    tid, ri, cj, vals = blocked.scatter_plan
    sel = (layout.tile_owner_r[tid] == r) & (layout.tile_owner_c[tid] == c)
    out = np.zeros((layout.lmax, blocked.nb, blocked.nb),
                   dtype=blocked.dtype)
    np.add.at(out, (layout.tile_slot[tid[sel]], ri[sel], cj[sel]),
              vals[sel])
    return out[None, None]


def gather_tiles(blocked: BlockedMatrix, layout: DistLayout,
                 dist_tiles) -> np.ndarray:
    """Sharded [p,q,lmax,nb,nb] -> global [num_tiles+1, nb, nb]."""
    host = np.asarray(dist_tiles)
    nb = blocked.nb
    out = np.zeros((blocked.num_tiles + 1, nb, nb), dtype=host.dtype)
    out[: blocked.num_tiles] = host[
        layout.tile_owner_r, layout.tile_owner_c, layout.tile_slot]
    return out


class DistributedLU:
    """Multi-chip gstrf executor."""

    def __init__(self, blocked: BlockedMatrix, schedule: Schedule | None,
                 mesh_shape, backend: KernelBackend | None = None,
                 perf: PerfCounters | None = None, mesh: Mesh | None = None):
        self.blocked = blocked
        self.schedule = schedule or build_schedule(blocked)
        self.backend = backend or get_backend(
            "auto", nb=blocked.nb, dtype=blocked.dtype)
        self.perf = perf or PerfCounters()
        if mesh is None:
            from pangulu_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(int(np.prod(mesh_shape)))
        self.mesh = mesh
        self.p, self.q = mesh.devices.shape
        self.layout = build_layout(blocked, self.p, self.q)
        self._levels = self._put_tables(self._prepare_levels())
        self._step = self._build_step()

    def _put_tables(self, tables: dict) -> dict:
        """Ship the [p, q, ...] index tables to their owning devices
        (multi-host safe: each process materializes only its shards)."""
        from pangulu_tpu.parallel.multihost import put_grid_sharded

        return {
            k: put_grid_sharded(
                self.mesh, v.shape,
                lambda r, c, v=v: v[r:r + 1, c:c + 1])
            for k, v in tables.items()
        }

    # ---- host-side per-level index tables ------------------------------

    def _prepare_levels(self):
        lay, p, q = self.layout, self.p, self.q
        scratch = lay.lmax - 1
        bl = self.schedule.block_length
        # Global maxima: one shape for every level so the whole level
        # loop runs on-device in one dispatch (fused engine).
        nlp = max(self.schedule.max_lpanel, 1)
        nup = max(self.schedule.max_upanel, 1)
        # max updates landing on any single device at any level
        nupd = 1
        per_dev_updates = []
        for lev in self.schedule.levels:
            counts = np.zeros((p, q), dtype=np.int64)
            triples = [[[] for _ in range(q)] for _ in range(p)]
            for dst, li, ui in zip(lev.upd_dst, lev.upd_l, lev.upd_u):
                r = lay.tile_owner_r[dst]
                c = lay.tile_owner_c[dst]
                triples[r][c].append((lay.tile_slot[dst], li, ui))
                counts[r, c] += 1
            per_dev_updates.append(triples)
            nupd = max(nupd, int(counts.max()))

        diag_slot = np.full((p, q, bl), scratch, dtype=np.int32)
        l_slot = np.full((p, q, bl, nlp), scratch, dtype=np.int32)
        l_mask = np.zeros((p, q, bl, nlp), dtype=bool)
        u_slot = np.full((p, q, bl, nup), scratch, dtype=np.int32)
        u_mask = np.zeros((p, q, bl, nup), dtype=bool)
        upd_dst = np.full((p, q, bl, nupd), scratch, dtype=np.int32)
        upd_l = np.zeros((p, q, bl, nupd), dtype=np.int32)
        upd_u = np.zeros((p, q, bl, nupd), dtype=np.int32)
        upd_mask = np.zeros((p, q, bl, nupd), dtype=bool)

        for lev, triples in zip(self.schedule.levels, per_dev_updates):
            k = lev.k
            kr, kc = k % p, k % q
            diag_slot[kr, kc, k] = lay.tile_slot[lev.diag]
            for t, (tid, bi) in enumerate(zip(lev.lpanel, lev.lrows)):
                r = bi % p
                l_slot[r, kc, k, t] = lay.tile_slot[tid]
                l_mask[r, kc, k, t] = True
            for t, (tid, bj) in enumerate(zip(lev.upanel, lev.ucols)):
                c = bj % q
                u_slot[kr, c, k, t] = lay.tile_slot[tid]
                u_mask[kr, c, k, t] = True
            for r in range(p):
                for c in range(q):
                    for t, (s, li, ui) in enumerate(triples[r][c]):
                        upd_dst[r, c, k, t] = s
                        upd_l[r, c, k, t] = li
                        upd_u[r, c, k, t] = ui
                        upd_mask[r, c, k, t] = True
        return dict(diag_slot=diag_slot, l_slot=l_slot, l_mask=l_mask,
                    u_slot=u_slot, u_mask=u_mask, upd_dst=upd_dst,
                    upd_l=upd_l, upd_u=upd_u, upd_mask=upd_mask)

    # ---- device step ----------------------------------------------------

    def _build_step(self):
        backend = self.backend
        p, q = self.p, self.q
        mesh = self.mesh
        bl = self.schedule.block_length

        def run(tiles, diag_slot, l_slot, l_mask, u_slot, u_mask,
                upd_dst, upd_l, upd_u, upd_mask):
            # shapes inside shard_map: tiles [1,1,L,nb,nb]; tables
            # [1,1,bl,...] — drop the unit mesh dims, loop levels
            # on-device.
            tiles = tiles[0, 0]
            diag_slot = diag_slot[0, 0]
            l_slot, l_mask = l_slot[0, 0], l_mask[0, 0]
            u_slot, u_mask = u_slot[0, 0], u_mask[0, 0]
            upd_dst, upd_l = upd_dst[0, 0], upd_l[0, 0]
            upd_u, upd_mask = upd_u[0, 0], upd_mask[0, 0]
            dt = tiles.dtype
            my_r = jax.lax.axis_index("gp")
            my_c = jax.lax.axis_index("gq")

            def body(k, tiles):
                is_owner = jnp.logical_and(my_r == k % p, my_c == k % q)
                # 1. diag broadcast (masked psum over both axes), then
                #    redundant GETRF + inverses everywhere.
                local_diag = tiles[diag_slot[k]]
                contrib = jnp.where(is_owner, local_diag,
                                    jnp.zeros_like(local_diag))
                diag_a = jax.lax.psum(contrib, ("gp", "gq"))
                diag_f, linv, uinv = backend.diag_factor_invert(diag_a, None)
                tiles = tiles.at[diag_slot[k]].set(
                    jnp.where(is_owner, diag_f, tiles[diag_slot[k]]))
                # 2. panel solves + masked-psum broadcasts.
                lm = l_mask[k][:, None, None]
                lblk = jnp.matmul(tiles[l_slot[k]], uinv,
                                  preferred_element_type=dt)
                lblk = jnp.where(lm, lblk, jnp.zeros_like(lblk))
                tiles = tiles.at[l_slot[k]].set(
                    jnp.where(lm, lblk, tiles[l_slot[k]]))
                lpanel = jax.lax.psum(lblk, "gq")
                um = u_mask[k][:, None, None]
                ublk = jnp.matmul(linv, tiles[u_slot[k]],
                                  preferred_element_type=dt)
                ublk = jnp.where(um, ublk, jnp.zeros_like(ublk))
                tiles = tiles.at[u_slot[k]].set(
                    jnp.where(um, ublk, tiles[u_slot[k]]))
                upanel = jax.lax.psum(ublk, "gp")
                # 3. local Schur updates.
                prod = jnp.matmul(lpanel[upd_l[k]], upanel[upd_u[k]],
                                  preferred_element_type=dt)
                prod = jnp.where(upd_mask[k][:, None, None], prod,
                                 jnp.zeros_like(prod))
                tiles = tiles.at[upd_dst[k]].add(-prod)
                return tiles

            tiles = jax.lax.fori_loop(0, bl, body, tiles)
            return tiles[None, None]

        specs = P("gp", "gq")
        shard = jax.shard_map(
            run, mesh=mesh,
            in_specs=(specs,) * 10,
            out_specs=specs,
            # Pallas calls inside the body have no varying-mesh-axes
            # annotation; collectives/masks are managed explicitly
            check_vma=False,
        )
        return jax.jit(shard, donate_argnums=(0,))

    # ---- driver ----------------------------------------------------------

    def factorize(self, dist_tiles=None):
        if dist_tiles is None:
            from pangulu_tpu.parallel.multihost import put_grid_sharded

            # Each process builds ONLY its addressable shards (works
            # identically single-host and on a multi-host pod slice).
            shape = (self.p, self.q, self.layout.lmax,
                     self.blocked.nb, self.blocked.nb)
            with self.perf.phase("preprocess"):
                dist_tiles = put_grid_sharded(
                    self.mesh, shape,
                    lambda r, c: scatter_tiles_shard(
                        self.blocked, self.layout, r, c))
        t = self._levels
        ctx = jax.default_matmul_precision("highest")
        with self.perf.phase("numeric"), ctx:
            dist_tiles = self._step(
                dist_tiles, t["diag_slot"], t["l_slot"], t["l_mask"],
                t["u_slot"], t["u_mask"], t["upd_dst"], t["upd_l"],
                t["upd_u"], t["upd_mask"])
            dist_tiles = device_sync(dist_tiles)
        self.perf.add_flops(self.schedule.flop_estimate())
        self.dist_tiles = dist_tiles
        if not dist_tiles.is_fully_addressable:
            # multi-host: the global gather is neither possible nor
            # needed — solves read the sharded tiles directly.
            return None
        return gather_tiles(self.blocked, self.layout, dist_tiles)
