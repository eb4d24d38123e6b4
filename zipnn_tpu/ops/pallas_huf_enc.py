"""Pallas TPU kernel: lockstep multi-stream Huffman ENCODE (shared tables).

The mirror image of ops/pallas_huf.py: 2048 streams per grid step, one per
vector lane, each running a forward bit writer.  Per symbol: one within-row
``dynamic_gather`` for the (code value, length) pair from the shared <=8-bit
table, an LSB-first 64-bit accumulator append, and a masked word flush.
The per-lane *vertical write* problem (each lane emits words at its own
pace into its own stream buffer) mirrors decode's vertical fetch and uses
the same synchronized window hierarchy in reverse: flushed words land in 8
registers (w8), dumped 4-at-a-time into a 64-row VMEM window (W3) at
per-lane aligned offsets, which spills 32 rows at a time into the output
block.

Output streams are bit-exact with ops/entropy/huf.py's ``encode_stream``
(symbols are pre-reversed by the caller; the sentinel closes each stream),
so containers stay byte-identical across engines.

Reference equivalent: HUF_compress4X (vendored FSE lib), called at
csrc/zipnn_core.c:366.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

TMAX = 8
SUBS = 16  # sublane rows per block: 2 vregs/op = 2-way ILP on the
# append/flush dependency chain (same change that took decode 8.0->9.6
# GB/s; the kernels are latency-bound, not issue-bound)
BLOCK = SUBS * 128


def pack_etable8(vals: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """[SUBS,128] int32: per symbol s, 16-bit entry ``val | nb << 8``."""
    if int(lengths.max()) > TMAX:
        raise ValueError("shared encode table must have <=8-bit codes")
    ent = vals.astype(np.uint32)[:256] | (lengths.astype(np.uint32)[:256] << 8)
    packed = (ent[0::2] | (ent[1::2] << 16)).astype(np.uint32)
    return np.broadcast_to(packed, (SUBS, 128)).astype(np.int32)


def _build_kernel(SW: int, SEG: int):
    import jax
    import jax.numpy as jnp

    assert SW % 32 == 0 and SW >= 96, SW
    assert SEG % 64 == 0, SEG
    U = jnp.uint32
    I = jnp.int32
    N_PERIODS = SEG // 64

    def kernel(syms_ref, tbl_ref, out_ref, bits_ref, w3_ref):
        tbl = tbl_ref[:, :]
        first = syms_ref[0, 0, :, :]

        # non-foldable zeros tied to loaded data (Mosaic layout round-trip)
        zero = ((first >> U(16)) >> U(16)).astype(I)
        uzero = (first >> U(16)) >> U(16)
        acc_lo = uzero
        acc_hi = uzero
        nbits = zero  # bits in the 64-bit accumulator
        total = zero
        wpos = zero  # next word slot to write
        base2 = zero  # w8 covers [base2, base2+8)
        base3 = zero  # W3 covers [base3, base3+64), aligned 32
        w8 = [uzero for _ in range(8)]
        for m in range(64):
            w3_ref[m, :, :] = uzero

        def append(acc_lo, acc_hi, nbits, total, val, nb):
            """LSB-first append of nb bits of val at position nbits (< 48)."""
            nbu = nbits.astype(U)
            lo_add = jnp.where(nbits < 32, val << (nbu & U(31)), U(0))
            hi_sh = jnp.where(nbits >= 32, nbits - 32, 0).astype(U)
            hi_add = jnp.where(
                nbits >= 32,
                val << hi_sh,
                jnp.where(nbits == 0, U(0), val >> (U(32) - nbu)),
            )
            return acc_lo | lo_add, acc_hi | hi_add, nbits + nb, total + nb

        def flush(acc_lo, acc_hi, nbits, wpos, w8, cond):
            """Masked: emit the low 32 accumulator bits into w8[wpos-base2]."""
            fl = cond & (nbits >= 32)
            kk = wpos - base2_ref[0]
            for k in range(8):
                w8[k] = jnp.where(fl & (kk == k), acc_lo, w8[k])
            acc_lo = jnp.where(fl, acc_hi, acc_lo)
            acc_hi = jnp.where(fl, uzero, acc_hi)
            nbits = jnp.where(fl, nbits - 32, nbits)
            wpos = jnp.where(fl, wpos + 1, wpos)
            return acc_lo, acc_hi, nbits, wpos, w8

        # small mutable cell for base2 so flush() sees the current value
        base2_ref = [base2]

        def spill_w3(base3, base2):
            """Masked: move W3's lower 32 rows into the output block."""
            spill = (base2 - base3) >= 32
            c3 = jnp.maximum(base3, 0) >> 5
            for m in range(32):
                row = w3_ref[m, :, :]
                for cc in range(SW // 32):
                    r = min(cc * 32 + m, SW - 1)
                    cur = out_ref[0, r, :, :]
                    out_ref[0, r, :, :] = jnp.where(spill & (c3 == cc), row, cur)
            for m in range(32):
                w3_ref[m, :, :] = jnp.where(spill, w3_ref[m + 32, :, :], w3_ref[m, :, :])
            return jnp.where(spill, base3 + 32, base3)

        def dump_w8(base2, base3, wpos, w8):
            """Masked: move w8[0:4] into W3 when the window is half full."""
            dump = (wpos - base2) >= 4
            q2 = jnp.maximum(base2 - base3, 0) >> 2
            for k in range(4):
                for q in range(16):
                    cur = w3_ref[4 * q + k, :, :]
                    w3_ref[4 * q + k, :, :] = jnp.where(dump & (q2 == q), w8[k], cur)
            for k in range(4):
                w8[k] = jnp.where(dump, w8[k + 4], w8[k])
            for k in range(4, 8):
                w8[k] = jnp.where(dump, uzero, w8[k])
            return jnp.where(dump, base2 + 4, base2), w8

        def period(outer, carry):
            acc_lo, acc_hi, nbits, total, wpos, base2, base3, *w8 = carry
            w8 = list(w8)
            base3 = spill_w3(base3, base2)  # once per 64 symbols

            for sub in range(8):
                base2, w8 = dump_w8(base2, base3, wpos, w8)
                base2_ref[0] = base2
                for half in range(2):
                    row = outer * 16 + sub * 2 + half
                    w = syms_ref[0, row, :, :]
                    for pair in range(2):
                        # fuse each symbol PAIR into one <=16-bit code:
                        # one append + one flush per two symbols
                        sa = (w >> U(16 * pair)).astype(I) & 255
                        sb = (w >> U(16 * pair + 8)).astype(I) & 255
                        ga = jnp.take_along_axis(tbl, sa >> 1, axis=1).astype(U)
                        ea = jnp.where((sa & 1) == 1, ga >> U(16), ga) & U(0xFFFF)
                        gb = jnp.take_along_axis(tbl, sb >> 1, axis=1).astype(U)
                        eb = jnp.where((sb & 1) == 1, gb >> U(16), gb) & U(0xFFFF)
                        na = ea >> U(8)  # <= 8
                        val2 = (ea & U(0xFF)) | ((eb & U(0xFF)) << na)
                        nb2 = (na + (eb >> U(8))).astype(I)
                        # uncodeable byte (table entry nb == 0 <=> entry
                        # < 256, only possible for a symbol absent from a
                        # SAMPLED table build): latch bit 30 of the bit
                        # count.  Low bits stay < 2^16 so the adds below
                        # never carry into it.
                        bad = (ea < U(256)) | (eb < U(256))
                        total = total | jnp.where(bad, I(1) << 30, zero)
                        acc_lo, acc_hi, nbits, total = append(
                            acc_lo, acc_hi, nbits, total, val2, nb2
                        )
                        # nb2 <= 16: nbits stays < 48 at every append
                        acc_lo, acc_hi, nbits, wpos, w8 = flush(
                            acc_lo, acc_hi, nbits, wpos, w8, nbits >= 0
                        )

            return (acc_lo, acc_hi, nbits, total, wpos, base2, base3, *w8)

        carry = (acc_lo, acc_hi, nbits, total, wpos, base2, base3, *w8)
        carry = jax.lax.fori_loop(0, N_PERIODS, period, carry)
        acc_lo, acc_hi, nbits, total, wpos, base2, base3, *w8 = carry
        w8 = list(w8)
        base2_ref = [base2]

        # sentinel bit at position nbits (post-loop nbits < 48)
        nbu = nbits.astype(U)
        s_hi_sh = jnp.where(nbits >= 32, nbits - 32, 0).astype(U)
        acc_lo = acc_lo | jnp.where(nbits < 32, U(1) << (nbu & U(31)), U(0))
        acc_hi = acc_hi | jnp.where(nbits >= 32, U(1) << s_hi_sh, U(0))
        nbits = nbits + 1
        total = total + 1

        # drain: flush up to 2 words (nbits < 49), padding partial words;
        # dump/spill FIRST so the w8 slot index stays < 8
        for _f in range(2):
            base3 = spill_w3(base3, base2)
            base2, w8 = dump_w8(base2, base3, wpos, w8)
            fl = nbits > 0
            kk = wpos - base2
            for k in range(8):
                w8[k] = jnp.where(fl & (kk == k), acc_lo, w8[k])
            acc_lo = jnp.where(fl, acc_hi, acc_lo)
            acc_hi = jnp.where(fl, uzero, acc_hi)
            nbits = jnp.where(fl, nbits - 32, nbits)
            wpos = jnp.where(fl, wpos + 1, wpos)

        # final drains: force everything left in W3 and w8 into out
        for _d in range(3):
            base3 = spill_w3(base3, base2 + 64)
        c2 = jnp.maximum(base2, 0) >> 2
        for k in range(8):
            kk = wpos - base2
            for cc in range(SW // 4):
                r = min(cc * 4 + k, SW - 1)
                cur = out_ref[0, r, :, :]
                out_ref[0, r, :, :] = jnp.where((c2 == cc) & (kk > k), w8[k], cur)
        bits_ref[0, :, :] = total

    return kernel


# Set True to run the kernel via the Pallas interpreter (CPU tests).
INTERPRET = False


def _encode_call(SW: int, SEG: int, n_blocks: int):
    return _encode_call_cached(SW, SEG, n_blocks, INTERPRET)


@lru_cache(maxsize=None)
def _encode_call_cached(SW: int, SEG: int, n_blocks: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _build_kernel(SW, SEG)
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, SEG // 4, SUBS, 128), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBS, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, SW, SUBS, 128), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBS, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, SW, SUBS, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n_blocks, SUBS, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((64, SUBS, 128), jnp.uint32)],
        # double-buffered in+out blocks at seg=4096 are ~17MB, past the
        # 16MB default scoped-vmem limit (v5e has 128MB physical)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )
    return jax.jit(call)


def _sw_for(seg: int) -> int:
    SW = -(-(seg + 32) // 32) * 32 // 4 + 32  # seg bytes max + slack, words
    return max(96, -(-SW // 32) * 32)


def sw_for_expected(seg: int, bits_per_symbol: float) -> int:
    """Optimistic output width from the plane's expected code length.

    The kernel clamps spills at row SW-1 and keeps exact bit counts, so an
    under-sized row only corrupts that one stream's output, which the
    caller detects via ``bits`` and re-encodes on the host (rare: the
    budget is 15% + 2048 bits over the histogram expectation, and
    adversarial flat data drives the expectation itself to 8 bits).
    Quantized up to 128 words to bound kernel recompiles.
    """
    bits = bits_per_symbol * seg * 1.15 + 2048
    sw = -(-int(bits) // (32 * 128)) * 128
    return max(128, min(sw, _sw_for(seg)))


def _call_blocks(words_rev, seg: int, tbl8e, sw=None):
    """Kernel dispatch on LE-packed PRE-REVERSED stream words [S, seg//4]."""
    import jax.numpy as jnp

    S = words_rev.shape[0]
    S_pad = -(-S // BLOCK) * BLOCK
    n_blocks = S_pad // BLOCK
    SW = _sw_for(seg) if sw is None else sw
    x = words_rev.astype(jnp.uint32)
    if S_pad != S:
        x = jnp.concatenate(
            [x, jnp.zeros((S_pad - S, seg // 4), jnp.uint32)]
        )
    blocks = x.reshape(n_blocks, SUBS, 128, seg // 4).transpose(0, 3, 1, 2)
    out, bits = _encode_call(SW, seg, n_blocks)(blocks, jnp.asarray(tbl8e))
    rows = out.transpose(0, 2, 3, 1).reshape(S_pad, SW)
    return rows[:S], bits.reshape(-1)[:S]


def encode_words(rows_words, tbl8e, seg: int, sw=None):
    """Encode S streams given their FORWARD-order LE-packed words
    ([S, seg//4] uint32 on device) with one shared <=8-bit table.

    Symbol reversal (the backward bit-writer order) happens in word space:
    reverse the word row and byteswap each word.  Returns (words [S, SW]
    uint32 device, total_bits [S] int32 device).  ``sw`` overrides the
    worst-case output width (see :func:`sw_for_expected`); a stream whose
    (exact) bit count exceeds ``sw*32`` has truncated row data and must be
    re-encoded by the caller.

    ``total_bits`` bit 30 is the UNCODEABLE flag: set when any symbol of
    the stream had a zero-length table entry (possible only under the
    sampled table build, codec.shared_sample_stride); such a stream's
    output is invalid and the cell must store raw.  Mask with
    ``& 0x3FFFFFFF`` for the bit count.
    """
    import jax.numpy as jnp

    w = rows_words[:, ::-1].astype(jnp.uint32)
    U = jnp.uint32
    rev = (
        (w >> U(24))
        | ((w >> U(8)) & U(0xFF00))
        | ((w << U(8)) & U(0xFF0000))
        | (w << U(24))
    )
    return _call_blocks(rev, seg, tbl8e, sw)


def encode_shared_table(syms_rev, tbl8e, seg: int):
    """Encode S streams (symbols PRE-REVERSED, [S, seg] uint8 on device or
    host) with one shared <=8-bit table.

    Returns (words [S, SW] uint32 device, total_bits [S] int32 device) where
    stream bytes are the first ceil(total_bits/8) bytes of each row.
    """
    import jax.numpy as jnp

    from . import jax_transforms

    S, seg_in = syms_rev.shape
    assert seg_in == seg and seg % 64 == 0

    x = jnp.asarray(syms_rev, jnp.uint8)
    words = jax_transforms.u8_flat_to_u32(x.reshape(-1))  # LE pack per row
    return _call_blocks(words.reshape(S, seg // 4), seg, tbl8e)
