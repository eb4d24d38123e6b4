"""Pallas TPU kernel: fused per-chunk plane assembly (the decode back half).

The fused decode pipelines used to finish with six XLA passes over the
whole container — stored-row gather, stored-row word/byte alignment,
symbol post-map (d-index -> byte via per-cell tables), row concatenation,
permutation gather (``all_rows[perm]``) and the byte-group combine —
~6 GB of HBM traffic for a 768 MB output (the reference does the same
assembly on the host, one memcpy per chunk, in
``decompression_chunk_worker`` csrc/zipnn_core.c:768-861).  This kernel
collapses all of them into ONE streaming pass:

* the grid walks output chunks; scalar-prefetched ``kinds/srcs`` say where
  each (chunk, plane) cell's row lives (a payload tile offset for stored
  cells / an RLE byte / a Huffman cell ordinal), and a manual
  double-buffered DMA fetches exactly that row from HBM — no concatenated
  copy, no gather pass, no dummy reads;
* stored cells are DMA'd tile-aligned straight from the payload tiles and
  word/byte-aligned IN-KERNEL (one ``pltpu.roll`` + sublane-carry select,
  the pallas_gather.align_rows math) — the two standalone passes
  disappear;
* Huffman cells arrive as the decode kernel's 16-bit d-indices and are
  mapped to symbols in-kernel with the cell's own table, delivered as an
  auto-pipelined block whose index comes from the scalar prefetch
  (``pages[pgidx[cell]]``) — per-cell tables at whole-tile granularity,
  where the per-sublane trick of ops/pallas_huf_pc.py is not needed
  because one grid step touches one cell per plane;
* planes are byte-interleaved (+ sign-rotation revert) in registers and
  the final output words stream straight to HBM.

Traffic for a bf16 chunk: read one d-pair row (2x plane bytes) + one
stored tile row (1x), write the chunk (2x) — ~1.6 GB total at 768 MB, vs
~6 GB for the pass-per-stage pipeline it replaces.

Supports num_buf 1 (fp8) and 2 (bf16/fp16); num_buf 4 (fp32) keeps the
XLA combine path (ops/jax_transforms.combine_4).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

INTERPRET = False

# scalar-prefetch SMEM budget: max chunks per kernel call (see combine_cells)
B_CAP = 4096


def _build_kernel(nb: int, R: int, P: int, bit_reorder: int, map_d: bool,
                  B: int, tlog: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    U = jnp.uint32
    I = jnp.int32

    def kernel(kinds, srcs, rlev, pgq, stt, senc, hsrc, tiles, *rest):
        if map_d:
            pages = rest[:nb]
            rest = rest[nb:]
        out_ref, hbuf, sbuf, pbuf, hsem, ssem = rest
        c = pl.program_id(0)

        def issue(ci, slot):
            for b in range(nb):
                k = kinds[ci * nb + b]

                @pl.when(k == 2)
                def _():
                    pltpu.make_async_copy(
                        hsrc.at[srcs[ci * nb + b]], hbuf.at[slot, b],
                        hsem.at[slot, b],
                    ).start()

                @pl.when(k == 0)
                def _():
                    pltpu.make_async_copy(
                        tiles.at[pl.ds(stt[ci * nb + b], R + 1), :],
                        sbuf.at[slot, b], ssem.at[slot, b],
                    ).start()

        @pl.when(c == 0)
        def _():
            issue(0, 0)

        @pl.when(c + 1 < B)
        def _():
            issue(c + 1, (c + 1) % 2)

        slot = c % 2
        lane128 = jax.lax.broadcasted_iota(I, (R, 128), 1)

        def align_tile(b):
            """Stored rows: word+byte alignment in registers — the
            pallas_gather.align_rows math on the (R+1, 128) tile slab."""
            enc = senc[c * nb + b]
            dw = enc & 127
            sh = (enc >> 7).astype(jnp.uint32)  # 0, 8, 16 or 24
            x = sbuf[slot, b]
            a = pltpu.roll(x, (128 - dw) % 128, axis=1)
            w = jnp.where(lane128 < 128 - dw, a[:R], a[1:])
            a2 = pltpu.roll(x, (128 - dw - 1) % 128, axis=1)
            wn = jnp.where(lane128 < 127 - dw, a2[:R], a2[1:])
            shifted = (w >> sh) | (wn << ((jnp.uint32(32) - sh) & 31))
            return jnp.where(sh == 0, w, shifted)

        def map_tile(b):
            """d-pair rows (R, 256) -> plane words (R, 128), one table."""
            dwt = hbuf[slot, b]
            pg = pages[b]

            def sym(d):
                q = d >> 2
                li = q & 127
                page = q >> 7
                t = jnp.broadcast_to(pg[0, 0, :][None, :], (R, 128))
                g = jnp.take_along_axis(t, li, axis=1)
                for p in range(1, P):
                    tp = jnp.broadcast_to(pg[0, p, :][None, :], (R, 128))
                    g = jnp.where(
                        page == p, jnp.take_along_axis(tp, li, axis=1), g
                    )
                return (g.astype(U) >> ((d.astype(U) & U(3)) << U(3))) & U(0xFF)

            w0 = dwt[:, 0:128]
            w1 = dwt[:, 128:256]
            h0 = sym((w0 & U(0xFFFF)).astype(I)) | (
                sym((w0 >> U(16)).astype(I)) << U(8)
            )
            h1 = sym((w1 & U(0xFFFF)).astype(I)) | (
                sym((w1 >> U(16)).astype(I)) << U(8)
            )
            gidx = (2 * lane128) & 127
            e0 = jnp.take_along_axis(h0, gidx, axis=1)
            o0 = jnp.take_along_axis(h0, gidx + 1, axis=1)
            e1 = jnp.take_along_axis(h1, gidx, axis=1)
            o1 = jnp.take_along_axis(h1, gidx + 1, axis=1)
            sel = lane128 < 64
            lo16 = jnp.where(sel, e0, e1)
            hi16 = jnp.where(sel, o0, o1)
            return lo16 | (hi16 << U(16))

        for b in range(nb):
            k = kinds[c * nb + b]

            @pl.when(k == 2)
            def _(b=b):
                pltpu.make_async_copy(
                    hsrc.at[srcs[c * nb + b]], hbuf.at[slot, b],
                    hsem.at[slot, b],
                ).wait()
                pbuf[b, :, :] = map_tile(b) if map_d else hbuf[slot, b]

            @pl.when(k == 0)
            def _(b=b):
                pltpu.make_async_copy(
                    tiles.at[pl.ds(stt[c * nb + b], R + 1), :],
                    sbuf.at[slot, b], ssem.at[slot, b],
                ).wait()
                pbuf[b, :, :] = align_tile(b)

            @pl.when(k == 1)
            def _(b=b):
                v = rlev[c * nb + b].astype(U)
                pbuf[b, :, :] = jnp.broadcast_to(v, (R, 128))

        if nb == 1:
            out_ref[0, :, :] = pbuf[0, :, :]
            return

        # byte-interleave the two planes (combine_2 semantics,
        # dtype16.c:167-216): plane words p0/p1 -> out words
        # out[2i] = pack(a0,b0,a1,b1)[i], out[2i+1] = pack(a2,b2,a3,b3)[i];
        # the out block is viewed (R, 256): out[k, j] = (j odd ? hi : lo)[k, j//2]
        p0 = pbuf[0, :, :]
        p1 = pbuf[1, :, :]
        a0 = p0 & U(0xFF)
        a1 = (p0 >> U(8)) & U(0xFF)
        a2 = (p0 >> U(16)) & U(0xFF)
        a3 = p0 >> U(24)
        b0 = p1 & U(0xFF)
        b1 = (p1 >> U(8)) & U(0xFF)
        b2 = (p1 >> U(16)) & U(0xFF)
        b3 = p1 >> U(24)
        lo = a0 | (b0 << U(8)) | (a1 << U(16)) | (b1 << U(24))
        hi = a2 | (b2 << U(8)) | (a3 << U(16)) | (b3 << U(24))

        def revert16(w):
            if not bit_reorder:
                return w
            # inverse of the bf16 sign rotation (dtype16.c:145-155)
            sign = (w << U(8)) & U(0x80008000)
            exp = (w >> U(1)) & U(0x7F807F80)
            man = w & U(0x007F007F)
            return sign | exp | man

        for h in range(2):
            idx = (lane128 >> 1) + I(64 * h)
            E = jnp.take_along_axis(lo, idx, axis=1)
            H = jnp.take_along_axis(hi, idx, axis=1)
            w = jnp.where((lane128 & 1) == 0, E, H)
            out_ref[0, :, 128 * h : 128 * (h + 1)] = revert16(w)

    return kernel


@lru_cache(maxsize=None)
def _combine_call_cached(nb: int, R: int, P: int, bit_reorder: int,
                         map_d: bool, B: int, tlog: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _build_kernel(nb, R, P, bit_reorder, map_d, B, tlog)
    LN = 256 if nb == 2 else 128
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),  # hsrc
        pl.BlockSpec(memory_space=pltpu.ANY),  # payload tiles
    ]
    if map_d:
        for b in range(nb):
            in_specs.append(
                pl.BlockSpec(
                    (1, P, 128),
                    lambda c, kinds, srcs, rlev, pgq, stt, senc, b=b, nb=nb: (
                        pgq[c * nb + b], 0, 0
                    ),
                    memory_space=pltpu.VMEM,
                )
            )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, R, LN), lambda c, *refs: (c, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, nb, R, 256 if map_d else 128), jnp.uint32),
            pltpu.VMEM((2, nb, R + 1, 128), jnp.uint32),
            pltpu.VMEM((nb, R, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, nb)),
            pltpu.SemaphoreType.DMA((2, nb)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, R, LN), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )
    return jax.jit(call)


def combine_cells(
    hsrc, tiles, rle_vals, perm,
    st_tiles, st_wsh, st_bsh,
    B: int, num_buf: int, plane_words: int,
    n_stored: int, n_rle: int,
    bit_reorder: int,
    pages=None, tlog_k: int = 0,
):
    """Assemble B output chunks from per-cell rows (device pipeline tail).

    ``hsrc``: Huffman rows — d-pair groups [G, R, 256] (with ``pages``)
    or decoded symbol groups [G, R, 128] (shared-table kernel output).
    ``tiles``: the container's payload tiles [X, 128] uint32
    (ops/jax_decode._tiles_call); stored cells are read straight out of
    them using per-cell tile index ``st_tiles`` + word shift ``st_wsh``
    + byte shift ``st_bsh`` (all [n_stored], exactly the
    pallas_gather.align_rows inputs).
    ``perm``: [B * num_buf] int32 into the virtual concatenation
    [stored | rle | huf] exactly as ops/jax_decode._batch_host builds it.
    Returns owords [B, num_buf * plane_words] uint32.
    """
    import jax.numpy as jnp

    if num_buf not in (1, 2):
        raise ValueError(f"combine_cells supports num_buf 1/2, got {num_buf}")
    R = plane_words // 128
    map_d = pages is not None
    P = (1 << tlog_k) // 512 if map_d else 0
    perm = perm.astype(jnp.int32)
    kinds = jnp.where(
        perm < n_stored, 0, jnp.where(perm < n_stored + n_rle, 1, 2)
    ).astype(jnp.int32)
    srcs = jnp.where(
        kinds == 0, perm,
        jnp.where(kinds == 1, perm - n_stored, perm - (n_stored + n_rle)),
    ).astype(jnp.int32)
    if n_stored:
        sidx = jnp.clip(perm, 0, n_stored - 1)
        stt = st_tiles.astype(jnp.int32)[sidx]
        senc = (
            st_wsh.astype(jnp.int32) | (st_bsh.astype(jnp.int32) << 7)
        )[sidx]
    else:
        stt = jnp.zeros_like(perm)
        senc = jnp.zeros_like(perm)
    if n_rle:
        v = rle_vals.astype(jnp.uint32)
        v = v | (v << 8) | (v << 16) | (v << 24)
        rlev = v[jnp.clip(perm - n_stored, 0, n_rle - 1)].astype(jnp.int32)
    else:
        rlev = jnp.zeros_like(perm)
    pgq = srcs if map_d else jnp.zeros_like(perm)

    pg = pages.reshape(pages.shape[0], P, 128) if map_d else None

    # scalar-prefetch arrays live in SMEM; at 6 arrays x B*nb int32 a
    # 32 KB-chunk batch (16k+ chunks) overflows it and the Mosaic compile
    # fails.  Segment the grid at B_CAP chunks — still one jit dispatch,
    # one compiled kernel per segment size (all segments equal, padded).
    if B <= B_CAP:
        segs = [(0, B, B)]
    else:
        nseg = -(-B // B_CAP)
        pad = nseg * B_CAP - B
        if pad:
            z = jnp.zeros(pad * num_buf, jnp.int32)
            # pad chunks as RLE (kind 1): no DMA at all, so padding never
            # reads out of bounds regardless of source array sizes
            kinds = jnp.concatenate([kinds, z + 1])
            srcs, rlev, pgq, stt, senc = (
                jnp.concatenate([x, z]) for x in (srcs, rlev, pgq, stt, senc)
            )
        segs = [(i * B_CAP, min((i + 1) * B_CAP, B), B_CAP)
                for i in range(nseg)]

    outs = []
    for lo, hi, bseg in segs:
        call = _combine_call_cached(
            num_buf, R, P, bit_reorder, map_d, bseg, tlog_k, INTERPRET
        )
        sl = slice(lo * num_buf, (lo + bseg) * num_buf)
        args = [kinds[sl], srcs[sl], rlev[sl], pgq[sl], stt[sl], senc[sl],
                hsrc, tiles]
        if map_d:
            args.extend([pg] * num_buf)
        out = call(*args)
        outs.append(out[: hi - lo])
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    return out.reshape(B, num_buf * plane_words)
