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
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pangulu_tpu.blocks import BlockedMatrix
from pangulu_tpu.ops.interface import KernelBackend, get_backend
from pangulu_tpu.schedule import Schedule, bucket, build_schedule
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
    out = np.zeros((p, q, lmax, nb, nb), dtype=blocked.tiles.dtype)
    out[layout.tile_owner_r, layout.tile_owner_c, layout.tile_slot] = \
        blocked.tiles[: blocked.num_tiles]
    return out


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
            "auto", nb=blocked.nb, dtype=blocked.tiles.dtype)
        self.perf = perf or PerfCounters()
        if mesh is None:
            from pangulu_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(int(np.prod(mesh_shape)))
        self.mesh = mesh
        self.p, self.q = mesh.devices.shape
        self.layout = build_layout(blocked, self.p, self.q)
        self._levels = self._prepare_levels()
        self._step = self._build_step()

    # ---- host-side per-level index tables ------------------------------

    def _prepare_levels(self):
        lay, p, q = self.layout, self.p, self.q
        scratch = lay.lmax - 1
        levels = []
        for lev in self.schedule.levels:
            k = lev.k
            kr, kc = k % p, k % q
            nlp = bucket(len(lev.lrows))
            nup = bucket(len(lev.ucols))
            # Global panel position -> owning device fills its slots.
            l_slot = np.full((p, q, max(nlp, 1)), scratch, dtype=np.int32)
            l_mask = np.zeros((p, q, max(nlp, 1)), dtype=bool)
            for t, (tid, bi) in enumerate(zip(lev.lpanel, lev.lrows)):
                r = bi % p
                l_slot[r, kc, t] = lay.tile_slot[tid]
                l_mask[r, kc, t] = True
            u_slot = np.full((p, q, max(nup, 1)), scratch, dtype=np.int32)
            u_mask = np.zeros((p, q, max(nup, 1)), dtype=bool)
            for t, (tid, bj) in enumerate(zip(lev.upanel, lev.ucols)):
                c = bj % q
                u_slot[kr, c, t] = lay.tile_slot[tid]
                u_mask[kr, c, t] = True
            # Per-device update lists.
            upd_lists = [[[] for _ in range(q)] for _ in range(p)]
            for dst, li, ui in zip(lev.upd_dst, lev.upd_l, lev.upd_u):
                r = lay.tile_owner_r[dst]
                c = lay.tile_owner_c[dst]
                upd_lists[r][c].append(
                    (lay.tile_slot[dst], li, ui))
            nupd = bucket(max((len(upd_lists[r][c])
                               for r in range(p) for c in range(q)),
                              default=0))
            upd_dst = np.full((p, q, max(nupd, 1)), scratch, dtype=np.int32)
            upd_l = np.zeros((p, q, max(nupd, 1)), dtype=np.int32)
            upd_u = np.zeros((p, q, max(nupd, 1)), dtype=np.int32)
            upd_mask = np.zeros((p, q, max(nupd, 1)), dtype=bool)
            for r in range(p):
                for c in range(q):
                    for t, (s, li, ui) in enumerate(upd_lists[r][c]):
                        upd_dst[r, c, t] = s
                        upd_l[r, c, t] = li
                        upd_u[r, c, t] = ui
                        upd_mask[r, c, t] = True
            diag_slot = np.full((p, q, 1), scratch, dtype=np.int32)
            diag_slot[kr, kc, 0] = lay.tile_slot[lev.diag]
            levels.append(dict(
                k=np.int32(k),
                diag_slot=diag_slot,
                l_slot=l_slot, l_mask=l_mask,
                u_slot=u_slot, u_mask=u_mask,
                upd_dst=upd_dst, upd_l=upd_l, upd_u=upd_u,
                upd_mask=upd_mask,
            ))
        return levels

    # ---- device step ----------------------------------------------------

    def _build_step(self):
        backend = self.backend
        p, q = self.p, self.q
        mesh = self.mesh

        def level_body(tiles, k, diag_slot, l_slot, l_mask, u_slot, u_mask,
                       upd_dst, upd_l, upd_u, upd_mask):
            # shapes inside shard_map: tiles [1,1,L,nb,nb]; tables [1,1,...]
            tiles = tiles[0, 0]
            nb = tiles.shape[-1]
            dt = tiles.dtype
            my_r = jax.lax.axis_index("gp")
            my_c = jax.lax.axis_index("gq")
            is_owner = jnp.logical_and(my_r == k % p, my_c == k % q)
            # 1. diag broadcast (masked psum over both axes), then
            #    redundant GETRF + inverses everywhere.
            local_diag = tiles[diag_slot[0, 0, 0]]
            contrib = jnp.where(is_owner, local_diag, jnp.zeros_like(local_diag))
            diag_a = jax.lax.psum(contrib, ("gp", "gq"))
            diag_f = backend.getrf(diag_a, None)
            linv, uinv = backend.diag_inverses(diag_f)
            tiles = tiles.at[diag_slot[0, 0, 0]].set(
                jnp.where(is_owner, diag_f, tiles[diag_slot[0, 0, 0]]))
            # 2. panel solves + masked-psum broadcasts.
            lm = l_mask[0, 0][:, None, None]
            lblk = jnp.matmul(tiles[l_slot[0, 0]], uinv,
                              preferred_element_type=dt)
            lblk = jnp.where(lm, lblk, jnp.zeros_like(lblk))
            tiles = tiles.at[l_slot[0, 0]].set(
                jnp.where(lm, lblk, tiles[l_slot[0, 0]]))
            lpanel = jax.lax.psum(lblk, "gq")
            um = u_mask[0, 0][:, None, None]
            ublk = jnp.matmul(linv, tiles[u_slot[0, 0]],
                              preferred_element_type=dt)
            ublk = jnp.where(um, ublk, jnp.zeros_like(ublk))
            tiles = tiles.at[u_slot[0, 0]].set(
                jnp.where(um, ublk, tiles[u_slot[0, 0]]))
            upanel = jax.lax.psum(ublk, "gp")
            # 3. local Schur updates.
            prod = jnp.matmul(lpanel[upd_l[0, 0]], upanel[upd_u[0, 0]],
                              preferred_element_type=dt)
            prod = jnp.where(upd_mask[0, 0][:, None, None], prod,
                             jnp.zeros_like(prod))
            tiles = tiles.at[upd_dst[0, 0]].add(-prod)
            return tiles[None, None]

        specs = P("gp", "gq")
        shard = jax.shard_map(
            level_body, mesh=mesh,
            in_specs=(P("gp", "gq"),) + (P(),) + (specs,) * 9,
            out_specs=P("gp", "gq"),
        )
        return jax.jit(shard, donate_argnums=(0,))

    # ---- driver ----------------------------------------------------------

    def factorize(self, dist_tiles=None):
        if dist_tiles is None:
            host = scatter_tiles(self.blocked, self.layout)
            sharding = NamedSharding(self.mesh, P("gp", "gq"))
            dist_tiles = jax.device_put(host, sharding)
        with self.perf.phase("numeric"):
            for lev in self._levels:
                dist_tiles = self._step(
                    dist_tiles, lev["k"], lev["diag_slot"],
                    lev["l_slot"], lev["l_mask"],
                    lev["u_slot"], lev["u_mask"],
                    lev["upd_dst"], lev["upd_l"], lev["upd_u"],
                    lev["upd_mask"])
            dist_tiles = jax.block_until_ready(dist_tiles)
        self.perf.add_flops(self.schedule.flop_estimate())
        self.dist_tiles = dist_tiles
        return gather_tiles(self.blocked, self.layout, dist_tiles)
