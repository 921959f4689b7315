"""Double-float (dd) mega-kernel: the ENTIRE r64-class numeric
factorization in ONE Pallas launch on f32 TPU hardware.

The reference factors R64 natively on every platform
(pangulu_common.h:11-33; its GPU numeric path is
platforms/.../pangulu_platform_0201000.cu).  The TPU has no f64
datapath, so values live as unevaluated f32 (hi, lo) pairs (ops.dd)
— and until round 4 the dd engines ran as XLA fori loops whose
per-level op-dispatch latency dominated (measured ~456 us/level at
n=4096 vs the f32 mega kernel's ~36 us/level).  This kernel removes
that: the same HBM-resident-tiles / per-level-DMA design as
:func:`~pangulu_tpu.ops.kernels_pallas.mega_factorize`, with every
numeric op in dd arithmetic:

  * tiles are stored INTERLEAVED ``[nt+1, 2, nb, nb]`` (hi plane 0,
    lo plane 1) so each tile still moves in ONE DMA;
  * the diagonal step is the Mosaic-proven rank-1 dd LU scan
    (ops.dd._dd_scan_math) + dd triangle inverses by ONE dd
    Newton–Schulz refinement of the f32 Newton inverses (f32 error
    ~2^-24 squares to the dd limit ~2^-48 in a single step);
  * panel solves and Schur row-products are exact-sliced dd matmuls
    (:func:`_dd_mm`): operands cut into NSLICE 8-bit slices on a
    power-of-two grid, slice products as plain bf16 MXU dots whose
    f32 accumulations are exact by construction, partials combined
    in dd on the VPU — the in-kernel form of ops.dd.dd_matmul
    (Mosaic has no batched dot, so the 28 pair products unroll as
    2D dots that pipeline back-to-back on the MXU).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangulu_tpu.ops import dd as D
from pangulu_tpu.ops.kernels_pallas import (_fori_loop, _interpret,
                                            _newton_inverses, x32_trace)

f32 = jnp.float32


def _dd_mm(ah, al, bh, bl):
    """In-kernel exact-sliced dd matmul (2D only): unrolled slice-pair
    bf16 MXU dots + dd combination.  Slices are WBITS-bit integers on
    a power-of-two grid — exactly representable in bf16 (8-bit
    significand), and the f32 accumulation over K <= 256 is exact
    (2*WBITS + log2(K) <= 24) — so each pair product is LOSSLESS on
    the MXU's native bf16 path."""
    sig_a, inv_a = D._scale_pow2(ah, axis=-1)
    sig_b, inv_b = D._scale_pow2(bh, axis=-2)
    a_b = [s.astype(jnp.bfloat16) for s in D._slices(ah, al, inv_a)]
    b_b = [s.astype(jnp.bfloat16) for s in D._slices(bh, bl, inv_b)]
    ch = cl = None
    for d in range(D.NSLICE):
        part = None
        for i in range(d + 1):
            p = lax.dot_general(a_b[i], b_b[d - i],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
            part = p if part is None else part + p
        if d == 0:
            ch, cl = part, jnp.zeros_like(part)
        else:
            ch, cl = D.dd_add(ch, cl, part, jnp.zeros_like(part))
    scale = sig_a * sig_b                    # power of two: exact
    return ch * scale, cl * scale


def _dd_inverses(fh, fl, *, nb, tol):
    """dd triangle inverses of a packed dd factor: f32 Newton–Schulz
    on the hi plane (error ~2^-24), then ONE dd Newton step
    X <- X(2I - T X) per triangle — quadratic convergence lands at
    the dd limit (~2^-48) in that single step, for 4 dd matmuls
    total instead of the exact block-recursive assembly's ~20
    (ops.dd.dd_lu_inverses, which Mosaic's layout rules can't host:
    unaligned lane-dim sub-blocks)."""
    rows = lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    cols = lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    z = np.float32(0.0)
    one = np.float32(1.0)
    two = np.float32(2.0)
    eye = jnp.where(rows == cols, one, z)
    li0, ui0 = _newton_inverses(fh, nb=nb, tol=tol)
    lmh = jnp.where(rows > cols, fh, z) + eye
    lml = jnp.where(rows > cols, fl, z)
    umh = jnp.where(rows <= cols, fh, z)
    uml = jnp.where(rows <= cols, fl, z)
    zeros = jnp.zeros((nb, nb), f32)

    def refine(tmh, tml, x0):
        th, tl = _dd_mm(tmh, tml, x0, zeros)
        sh, sl = D.dd_sub(two * eye, zeros, th, tl)
        return _dd_mm(x0, zeros, sh, sl)

    lih, lil = refine(lmh, lml, li0)
    uih, uil = refine(umh, uml, ui0)
    return (lih, lil), (uih, uil)


def _mega_kernel_dd(diag_tab, nl_tab, nu_tab, nup_tab, comb_hbm,
                    udst_hbm, udl_hbm, udu_hbm, tiles_in, tiles_out,
                    invs_out,
                    fbuf, linv_b, uinv_b, lpan, upan, prodrow, dstbuf,
                    comb_s, udst_c, udl_c, udu_c,
                    sem_diag, sem_inv, sem_l, sem_u, sem_lo, sem_uo,
                    sem_di, sem_do, sem_tab, sem_utab,
                    *, nb, tol, bl, pch, uch, comb_lw, comb_uw,
                    comb_rw):
    """dd twin of kernels_pallas._mega_kernel (see its docstring for
    the streaming design): one elimination level per fori iteration,
    combined index rows HBM->SMEM double-buffered, panels chunked
    through VMEM, Schur updates sorted by (u-chunk, l-chunk, l) so one
    dd row-product serves all updates sharing an L block.  Every tile
    move is ONE DMA of an interleaved (2, nb, nb) hi/lo pair."""
    i32 = jnp.int32
    lid_w = comb_lw
    uid_w = comb_uw
    row_w = comb_rw
    o_uid = lid_w
    o_udst = lid_w + uid_w
    o_udl = o_udst + row_w
    o_udu = o_udl + row_w
    comb_pad = -(-(lid_w + uid_w + 3 * row_w) // 1024) * 1024

    def _row_copy(k, sl):
        return pltpu.make_async_copy(
            comb_hbm.at[pl.ds(k * i32(comb_pad), comb_pad)],
            comb_s.at[pl.ds(sl * i32(comb_pad), comb_pad)],
            sem_tab.at[sl])

    _row_copy(0, 0).start()
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

        cin = pltpu.make_async_copy(tiles_out.at[dix], fbuf,
                                    sem_diag.at[0])
        # hoist the first Schur chunk's dst loads + first panel chunks:
        # they stream under the diag DMA + dd LU + inverse compute
        _fori_loop(0, jnp.minimum(nup, i32(uch)),
                   lambda j, c: (pltpu.make_async_copy(
                       tiles_out.at[udst_at(i32(0), j)],
                       dstbuf.at[j], sem_di.at[j]).start(), c)[1], 0)
        _fori_loop(0, jnp.minimum(nl, pch),
                   lambda i, c: (pltpu.make_async_copy(
                       tiles_out.at[lid_row[i]],
                       lpan.at[:, pl.ds(pl.multiple_of(i * nb, nb), nb),
                               :],
                       sem_l.at[i]).start(), c)[1], 0)
        _fori_loop(0, jnp.minimum(nu, pch),
                   lambda i, c: (pltpu.make_async_copy(
                       tiles_out.at[uid_row[i]],
                       upan.at[:, :, pl.ds(pl.multiple_of(i * nb, nb),
                                           nb)],
                       sem_u.at[i]).start(), c)[1], 0)

        # ---- dd diagonal step ------------------------------------------
        cin.wait()
        fh, fl = D._dd_scan_math(fbuf[0, :, :], fbuf[1, :, :],
                                 nb=nb, tol=tol)
        fbuf[0, :, :] = fh
        fbuf[1, :, :] = fl
        (lih, lil), (uih, uil) = _dd_inverses(fh, fl, nb=nb, tol=tol)
        linv_b[0, :, :] = lih
        linv_b[1, :, :] = lil
        uinv_b[0, :, :] = uih
        uinv_b[1, :, :] = uil
        pltpu.make_async_copy(fbuf, tiles_out.at[dix],
                              sem_diag.at[1]).start()
        pltpu.make_async_copy(linv_b, invs_out.at[k, 0],
                              sem_inv.at[0]).start()
        pltpu.make_async_copy(uinv_b, invs_out.at[k, 1],
                              sem_inv.at[1]).start()

        # ---- panel solves, chunked --------------------------------------
        def _l_copy(i, base, outward):
            src = lpan.at[:, pl.ds(pl.multiple_of(i * nb, nb), nb), :]
            dst = tiles_out.at[lid_row[base + i]]
            sem = (sem_lo if outward else sem_l).at[i]
            return (pltpu.make_async_copy(src, dst, sem) if outward
                    else pltpu.make_async_copy(dst, src, sem))

        nlc = lax.div(nl + i32(pch - 1), i32(pch))
        nuc = lax.div(nu + i32(pch - 1), i32(pch))

        def l_chunk(lc, c):
            base = lc * pch
            cnt = jnp.minimum(nl - base, pch)

            @pl.when(lc > 0)
            def _():
                _fori_loop(0, cnt,
                           lambda i, c: (_l_copy(i, base, False).start(),
                                         c)[1], 0)

            _fori_loop(0, cnt,
                       lambda i, c: (_l_copy(i, base, False).wait(),
                                     c)[1], 0)
            lh, ll = _dd_mm(lpan[0, :, :], lpan[1, :, :],
                            uinv_b[0, :, :], uinv_b[1, :, :])
            lpan[0, :, :] = lh
            lpan[1, :, :] = ll
            _fori_loop(0, cnt,
                       lambda i, c: (_l_copy(i, base, True).start(),
                                     c)[1], 0)

            @pl.when(nlc > 1)
            def _():
                _fori_loop(0, cnt,
                           lambda i, c: (_l_copy(i, base, True).wait(),
                                         c)[1], 0)

            return c

        _fori_loop(0, nlc, l_chunk, 0)

        def _u_copy(i, base, outward):
            src = upan.at[:, :, pl.ds(pl.multiple_of(i * nb, nb), nb)]
            dst = tiles_out.at[uid_row[base + i]]
            sem = (sem_uo if outward else sem_u).at[i]
            return (pltpu.make_async_copy(src, dst, sem) if outward
                    else pltpu.make_async_copy(dst, src, sem))

        def u_chunk(uc, c):
            base = uc * pch
            cnt = jnp.minimum(nu - base, pch)

            @pl.when(uc > 0)
            def _():
                _fori_loop(0, cnt,
                           lambda i, c: (_u_copy(i, base, False).start(),
                                         c)[1], 0)

            _fori_loop(0, cnt,
                       lambda i, c: (_u_copy(i, base, False).wait(),
                                     c)[1], 0)
            uh, ul = _dd_mm(linv_b[0, :, :], linv_b[1, :, :],
                            upan[0, :, :], upan[1, :, :])
            upan[0, :, :] = uh
            upan[1, :, :] = ul
            _fori_loop(0, cnt,
                       lambda i, c: (_u_copy(i, base, True).start(),
                                     c)[1], 0)

            @pl.when(nuc > 1)
            def _():
                _fori_loop(0, cnt,
                           lambda i, c: (_u_copy(i, base, True).wait(),
                                         c)[1], 0)

            return c

        _fori_loop(0, nuc, u_chunk, 0)

        # ---- Schur updates, chunks of ``uch`` ----------------------------
        cur0 = (jnp.maximum(nuc - 1, 0), jnp.maximum(nlc - 1, 0),
                i32(-1))

        def chunk(c, cur):
            base = c * uch
            cnt = jnp.minimum(nup - base, uch)

            @pl.when(c > 0)
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
                cur_uc, cur_lc, cur_l = cur
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
                    ub = ucj * pch
                    ucnt = jnp.minimum(nu - ub, pch)

                    def rin(i, c2):
                        pltpu.make_async_copy(
                            tiles_out.at[uid_row[ub + i]],
                            upan.at[:, :, pl.ds(
                                pl.multiple_of(i * nb, nb), nb)],
                            sem_u.at[i]).start()
                        return c2

                    _fori_loop(0, ucnt, rin, 0)

                    def rwait(i, c2):
                        pltpu.make_async_copy(
                            tiles_out.at[uid_row[ub + i]],
                            upan.at[:, :, pl.ds(
                                pl.multiple_of(i * nb, nb), nb)],
                            sem_u.at[i]).wait()
                        return c2

                    _fori_loop(0, ucnt, rwait, 0)

                @pl.when(lc_ch)
                def _():
                    lb = lcj * pch
                    lcnt = jnp.minimum(nl - lb, pch)

                    def rin(i, c2):
                        pltpu.make_async_copy(
                            tiles_out.at[lid_row[lb + i]],
                            lpan.at[:, pl.ds(
                                pl.multiple_of(i * nb, nb), nb), :],
                            sem_l.at[i]).start()
                        return c2

                    _fori_loop(0, lcnt, rin, 0)

                    def rwait(i, c2):
                        pltpu.make_async_copy(
                            tiles_out.at[lid_row[lb + i]],
                            lpan.at[:, pl.ds(
                                pl.multiple_of(i * nb, nb), nb), :],
                            sem_l.at[i]).wait()
                        return c2

                    _fori_loop(0, lcnt, rwait, 0)

                recompute = (li != cur_l) | uc_ch | lc_ch
                lsl = pl.ds(pl.multiple_of((li - lcj * pch) * nb, nb),
                            nb)

                @pl.when(recompute)
                def _():
                    ph, pl_ = _dd_mm(lpan[0, lsl, :], lpan[1, lsl, :],
                                     upan[0, :, :], upan[1, :, :])
                    prodrow[0, :, :] = ph
                    prodrow[1, :, :] = pl_

                usl = pl.ds(pl.multiple_of((uj - ucj * pch) * nb, nb),
                            nb)
                nh, nl2 = D.dd_sub(dstbuf[j, 0], dstbuf[j, 1],
                                   prodrow[0, :, usl],
                                   prodrow[1, :, usl])
                dstbuf[j, 0] = nh
                dstbuf[j, 1] = nl2
                pltpu.make_async_copy(dstbuf.at[j],
                                      tiles_out.at[udst_at(c, j)],
                                      sem_do.at[j]).start()
                return (ucj, lcj, li)

            cur = _fori_loop(0, cnt, d_compute, cur)

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
        _fori_loop(0, nchunks, chunk, cur0)

        # ---- level barrier ----------------------------------------------
        pltpu.make_async_copy(fbuf, tiles_out.at[dix],
                              sem_diag.at[1]).wait()
        pltpu.make_async_copy(linv_b, invs_out.at[k, 0],
                              sem_inv.at[0]).wait()
        pltpu.make_async_copy(uinv_b, invs_out.at[k, 1],
                              sem_inv.at[1]).wait()

        @pl.when(nup > 0)
        def _():
            last = nup - (nchunks - 1) * i32(uch)
            c_last = jnp.maximum(nchunks - 1, i32(0))
            _fori_loop(0, last,
                       lambda j, c: (pltpu.make_async_copy(
                           dstbuf.at[j],
                           tiles_out.at[udst_at(c_last, j)],
                           sem_do.at[j]).wait(), c)[1], 0)

        @pl.when(nlc == 1)
        def _():
            _fori_loop(0, nl,
                       lambda i, c: (_l_copy(i, 0, True).wait(),
                                     c)[1], 0)

        @pl.when(nuc == 1)
        def _():
            _fori_loop(0, nu,
                       lambda i, c: (_u_copy(i, 0, True).wait(),
                                     c)[1], 0)

        # prefetch diag(k+1): every write affecting it has landed
        pltpu.make_async_copy(tiles_out.at[diag_tab[nxt]], fbuf,
                              sem_diag.at[0]).start()
        return carry

    _fori_loop(0, bl, level, 0)
    _row_copy(i32(bl - 1), lax.rem(i32(bl), i32(2))).wait()
    pltpu.make_async_copy(tiles_out.at[diag_tab[bl - 1]], fbuf,
                          sem_diag.at[0]).wait()


# dd VMEM chunking: dstbuf is (uch, 2, nb, nb) and the slice-product
# live set is ~7 bf16 panel copies, so both chunk sizes run tighter
# than the f32 kernel's.
DD_UCH = 32
DD_MAX_PCH = 16


@x32_trace
@functools.partial(jax.jit,
                   static_argnames=("nb", "tol", "bl", "pch", "uch"),
                   donate_argnums=(0,))
def _mega_dd_call(tiles2, diag_tab, nl_tab, nu_tab, nup_tab,
                  lid_tab, uid_tab, udst_tab, udl_tab, udu_tab,
                  *, nb, tol, bl, pch, uch):
    dt = tiles2.dtype
    row_w = udst_tab.shape[-1]
    lid_w = lid_tab.shape[-1]
    uid_w = uid_tab.shape[-1]
    comb_w = lid_w + uid_w + 3 * row_w
    comb_pad = -(-comb_w // 1024) * 1024
    comb_tab = jnp.concatenate(
        [lid_tab, uid_tab, udst_tab[:, 0], udl_tab[:, 0],
         udu_tab[:, 0],
         jnp.zeros((lid_tab.shape[0], comb_pad - comb_w), jnp.int32)],
        axis=1).reshape(-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # comb_tab
            pl.BlockSpec(memory_space=pltpu.ANY),   # udst_tab
            pl.BlockSpec(memory_space=pltpu.ANY),   # udl_tab
            pl.BlockSpec(memory_space=pltpu.ANY),   # udu_tab
            pl.BlockSpec(memory_space=pltpu.ANY),   # tiles2
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, nb, nb), dt),            # fbuf
            pltpu.VMEM((2, nb, nb), dt),            # linv
            pltpu.VMEM((2, nb, nb), dt),            # uinv
            pltpu.VMEM((2, pch * nb, nb), dt),      # lpan
            pltpu.VMEM((2, nb, pch * nb), dt),      # upan
            pltpu.VMEM((2, nb, pch * nb), dt),      # prodrow
            pltpu.VMEM((uch, 2, nb, nb), dt),       # dstbuf
            pltpu.SMEM((2 * comb_pad,), jnp.int32),
            pltpu.SMEM((row_w,), jnp.int32),        # udst_c
            pltpu.SMEM((row_w,), jnp.int32),        # udl_c
            pltpu.SMEM((row_w,), jnp.int32),        # udu_c
            pltpu.SemaphoreType.DMA((2,)),          # sem_diag
            pltpu.SemaphoreType.DMA((2,)),          # sem_inv
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
        functools.partial(_mega_kernel_dd, nb=nb, tol=tol, bl=bl,
                          pch=pch, uch=uch, comb_lw=lid_w,
                          comb_uw=uid_w, comb_rw=row_w),
        out_shape=(jax.ShapeDtypeStruct(tiles2.shape, dt),
                   jax.ShapeDtypeStruct((bl, 2, 2, nb, nb), dt)),
        grid_spec=grid_spec,
        input_output_aliases={8: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(diag_tab, nl_tab, nu_tab, nup_tab,
      comb_tab, udst_tab, udl_tab, udu_tab, tiles2)


@x32_trace
@functools.partial(jax.jit,
                   static_argnames=("nb", "tol", "bl", "pch", "uch"),
                   donate_argnums=(0, 1))
def _mega_dd_entry(th, tl, diag_tab, nl_tab, nu_tab, nup_tab,
                   lid_tab, uid_tab, udst_tab, udl_tab, udu_tab,
                   *, nb, tol, bl, pch, uch):
    """One-dispatch entry: hi/lo interleave, the kernel, and the
    plane/inverse de-interleave all inside ONE jit.  As four separate
    device calls (stack / pallas / two slices) the tunnel paid ~3 ms
    of dispatch latency EACH — measured 22 ms/fact of pure fixed cost
    at n=4096 (the kernel itself is ~5 ms there)."""
    tiles2 = jnp.stack([th, tl], axis=1)
    tiles2, invs = _mega_dd_call(
        tiles2, diag_tab, nl_tab, nu_tab, nup_tab, lid_tab, uid_tab,
        udst_tab, udl_tab, udu_tab, nb=nb, tol=tol, bl=bl, pch=pch,
        uch=uch)
    return (tiles2[:, 0], tiles2[:, 1],
            invs[:, :, 0], invs[:, :, 1])


def mega_factorize_dd(th, tl, tables, *, nb, tol, bl):
    """Factor a dd tile store in ONE Pallas launch (one device
    dispatch end-to-end).

    th/tl: [nt+1, nb, nb] f32 hi/lo planes (donated).  ``tables``:
    Schedule.mega_tables(scratch, uch=DD_UCH, max_pch=DD_MAX_PCH) —
    pass jnp arrays (numeric.py ships them to the device ONCE at
    engine construction; numpy here would re-upload per call).
    Returns (th, tl, invh, invl) with invh/invl [bl, 2, nb, nb] —
    the dd triangle inverses the dd solve consumes."""
    t = {k: (v if isinstance(v, int) else jnp.asarray(v))
         for k, v in tables.items()}
    return _mega_dd_entry(
        th, tl, t["diag_tab"], t["nl_tab"], t["nu_tab"], t["nup_tab"],
        t["lid_tab"], t["uid_tab"], t["udst_tab"], t["udl_tab"],
        t["udu_tab"], nb=nb, tol=tol, bl=bl, pch=t["pch"],
        uch=t["uch"])
