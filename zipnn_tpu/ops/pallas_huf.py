"""Pallas TPU kernel: lockstep multi-stream Huffman decode (the fast path).

This is the speed-of-light decode path for ``.znn`` containers whose HUF
blocks share one code table with ``table_log <= 8`` (what our encoder's
``huffman_table="shared"`` mode emits; still a 100% standard container the
reference library reads).  Per-chunk-table containers fall back to the XLA
lockstep decoder in ops/jax_entropy.py.

Why this shape (see SURVEY.md §7 "hard parts"): bitstream decode is serial
per stream, so the kernel runs 1024 streams per grid step in SIMD lockstep —
one [8, 128] vector register row = 1024 lanes, one stream per lane.  The
three SIMD-hostile sub-problems and their solutions:

* **Table lookup** — Mosaic's within-row ``dynamic_gather``
  (``jnp.take_along_axis(axis=1)``) does 1024 independent lookups per
  instruction, but only within a 128-lane row.  A ``table_log <= 8`` table is
  256 16-bit entries = 128 packed uint32 = exactly one row, broadcast to all
  sublanes; one gather + a half-select per symbol.
* **Bit-container refill** — each lane consumes 1-8 bits/symbol from its own
  backward bitstream.  A 64-bit container (two uint32 regs) absorbs rate
  variance; a masked refill pulls one aligned word per lane per step at most.
* **Per-lane stream fetch** — the refill word lives at a per-lane position in
  the lane's private stream buffer (a vertical, cross-sublane gather TPUs
  don't have).  Solved with a window hierarchy with *synchronized* slides:
  8 registers (w8) cover 8 words, slid by 4 every 8 symbols from a 64-row
  VMEM window (W3), itself slid by 32 every 64 symbols from the stream
  buffer — every slide is a small masked select over aligned candidates,
  amortized to a few ops per symbol.

Streams are right-aligned in fixed-width rows, so every lane's top word
index is uniform (SW-1) and initialization is aligned.  Bytes around a
stream inside its row may be neighbor garbage: canonical prefix codes make
peeks insensitive to bits below the stream start (an entry covers all
low-bit variants), so only the final-position check needs exact lengths.

Reference equivalent: HUF_decompress inner loop (vendored FSE lib), called
at csrc/zipnn_core.c:807.
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import numpy as np

from .entropy import huf

TMAX = 8  # max table_log this kernel supports (one packed table row)
SUBS = 16  # sublane rows per block: 2 vregs/op = 2-way ILP on the
# per-symbol dependency chain (the kernel is latency-bound, not
# issue-bound; 16 rows measured +22% over 8 on v5e)
BLOCK = SUBS * 128  # streams per grid step, one per lane


# ---------------------------------------------------------------------------
# host: table expansion
# ---------------------------------------------------------------------------

def expand_dtable8(sym_t: np.ndarray, nb_t: np.ndarray, table_log: int) -> np.ndarray:
    """Expand a 2^table_log-entry dtable to a packed [8, 128] int32 block.

    Entry for an 8-bit peek ``x`` is the dtable entry for ``x >> (8 -
    table_log)``; pairs are packed 16-bit into uint32 lanes and broadcast to
    all sublanes so the in-row gather can run from any sublane.
    """
    if table_log > TMAX:
        raise ValueError(f"table_log {table_log} > {TMAX}")
    size = 1 << table_log
    idx8 = np.arange(256) >> (8 - table_log)
    ent = sym_t[idx8].astype(np.uint32) | (nb_t[idx8].astype(np.uint32) << 8)
    if np.any(nb_t[:size] == 0):
        raise ValueError("dtable has unpopulated entries (corrupt weights)")
    packed = (ent[0::2] | (ent[1::2] << 16)).astype(np.uint32)  # [128]
    return np.broadcast_to(packed, (SUBS, 128)).astype(np.int32)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _build_kernel(SW: int, SEG: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert SW >= 64 and SW % 32 == 0, SW
    assert SEG % 128 == 0, SEG
    U = jnp.uint32
    I = jnp.int32
    SW32 = SW // 32
    N_PERIODS = SEG // 128

    # the sentinel word index per lane lives in the top TRANGE rows of the
    # row buffer (tile-aligned gather leaves a sub-tile offset per stream)
    TRANGE = 130
    WTOP_MIN = SW - 1 - TRANGE

    def kernel(sbuf_ref, p0_ref, tbl_ref, out_ref, pend_ref, w3_ref):
        tbl = tbl_ref[:, :]
        p0 = p0_ref[0, :, :].astype(I)

        # ---- init: per-lane sentinel word (tile-aligned rows) -------------
        # W3 is a 96-row window [base3, base3+96) sliding by 32 once per
        # 128-symbol period: max drain is 32 words/period (8 bits/symbol),
        # so with base2-base3 in [36, 68) at period start the w8 fetch index
        # (base2-4-base3)>>2 stays in [0, 16) all period.
        wtop = (p0 - 1) >> 5
        base2 = ((wtop >> 2) << 2) - 4  # aligned 4; wtop - base2 in [4, 8)
        base3 = ((base2 - 36) >> 5) << 5  # aligned 32; base2 - base3 in [36, 68)

        b3min = ((((WTOP_MIN >> 2) << 2) - 4 - 36) >> 5) << 5
        b3max = (((((SW - 1) >> 2) << 2) - 4 - 36) >> 5) << 5
        c3 = base3 >> 5
        for m in range(96):
            # rows above wtop may fall past SW for top-of-buffer lanes; they
            # are never consumed (decode walks downward), so clamp the read
            row = sbuf_ref[0, min(max(b3min, 0) + m, SW - 1), :, :]
            for cc in range(max(b3min, 0) // 32 + 1, b3max // 32 + 1):
                row = jnp.where(c3 == cc, sbuf_ref[0, min(cc * 32 + m, SW - 1), :, :], row)
            w3_ref[m, :, :] = row

        q0 = (base2 - base3) >> 2  # in [9, 17)
        w8 = []
        for k in range(8):
            v = w3_ref[36 + k, :, :]
            for q in range(10, 17):
                v = jnp.where(q0 == q, w3_ref[4 * q + k, :, :], v)
            w8.append(v)

        def w8sel(idx):
            v = w8[0]
            for k in range(1, 8):
                v = jnp.where(idx == k, w8[k], v)
            return v

        w_a = w8sel(wtop - base2)      # word containing the sentinel
        w_b = w8sel(wtop - 1 - base2)  # the word below it
        s = (I(32) * (wtop + 1) - p0).astype(U)  # bits above sentinel, [0, 32)
        hi = (w_a << s) | jnp.where(s == 0, (w_a >> U(16)) >> U(16), w_b >> (U(32) - s))
        lo = w_b << s
        navail = I(64) - s.astype(I)
        p = p0
        wpos = wtop - 2

        def period(outer, carry):
            hi, lo, navail, p, wpos, base2, base3, *w8 = carry
            w8 = list(w8)

            # ---- W3 slide: every 128 symbols, per-lane 0 or 32 rows ------
            slide3 = (base2 - base3) < 36
            nbase3 = jnp.where(slide3, base3 - 32, base3)
            c3 = jnp.maximum(nbase3, 0) >> 5  # aligned-32 candidate id
            for m in range(95, 31, -1):
                w3_ref[m, :, :] = jnp.where(slide3, w3_ref[m - 32, :, :], w3_ref[m, :, :])
            for m in range(31, -1, -1):
                fetched = sbuf_ref[0, m, :, :]
                for cc in range(1, SW32):
                    fetched = jnp.where(c3 == cc, sbuf_ref[0, cc * 32 + m, :, :], fetched)
                w3_ref[m, :, :] = jnp.where(slide3, fetched, w3_ref[m, :, :])
            base3 = nbase3

            ob = jnp.zeros((SUBS, 128), U)
            for sub in range(16):
                # ---- w8 slide: every 8 symbols, per-lane 0 or 4 words ----
                slide2 = (wpos - base2) < 4
                nbase2 = jnp.where(slide2, base2 - 4, base2)
                q2 = jnp.maximum(nbase2 - base3, 0) >> 2  # aligned-4 W3 index
                for k in range(7, 3, -1):
                    w8[k] = jnp.where(slide2, w8[k - 4], w8[k])
                for k in range(3, -1, -1):
                    fetched = w3_ref[k, :, :]
                    for q in range(1, 16):
                        fetched = jnp.where(q2 == q, w3_ref[4 * q + k, :, :], fetched)
                    w8[k] = jnp.where(slide2, fetched, w8[k])
                base2 = nbase2

                for local in range(8):
                    # ---- one symbol in every lane -------------------------
                    peek = (hi >> U(24)).astype(I)
                    g = jnp.take_along_axis(tbl, peek >> 1, axis=1).astype(U)
                    ent = jnp.where((peek & 1) == 1, g >> U(16), g) & U(0xFFFF)
                    nb = (ent >> U(8)).astype(U)
                    sym = ent & U(0xFF)
                    hi = (hi << nb) | (lo >> (U(32) - nb))
                    lo = lo << nb
                    nbi = nb.astype(I)
                    navail = navail - nbi
                    p = p - nbi

                    if local % 2 == 1:
                        # masked refill every 2nd symbol: nb <= 8 so two
                        # steps drain <= 16 bits and the 64-bit container
                        # keeps navail >= 17 at every peek
                        need = navail <= 32
                        kk = wpos - base2
                        w = w8[0]
                        for k in range(1, 8):
                            w = jnp.where(kk == k, w8[k], w)
                        nau = navail.astype(U)
                        w_hi = jnp.where(navail < 32, w >> nau, U(0))
                        w_lo = w << (U(32) - nau)  # navail >= 17, shift < 32
                        hi = jnp.where(need, hi | w_hi, hi)
                        lo = jnp.where(need, lo | w_lo, lo)
                        navail = jnp.where(need, navail + 32, navail)
                        wpos = jnp.where(need, wpos - 1, wpos)

                    ob = (ob >> U(8)) | (sym << U(24))
                    if local % 4 == 3:
                        row = outer * 32 + (sub * 8 + local) // 4
                        out_ref[0, row, :, :] = ob

            return (hi, lo, navail, p, wpos, base2, base3, *w8)

        carry = (hi, lo, navail, p, wpos, base2, base3, *w8)
        carry = jax.lax.fori_loop(0, N_PERIODS, period, carry)
        pend_ref[0, :, :] = carry[3]

    return kernel


# Set True to run the kernel via the Pallas interpreter (CPU tests exercise
# the exact kernel logic; compiled Mosaic still requires a real TPU).
INTERPRET = False


def _decode_call(SW: int, SEG: int, n_blocks: int):
    return _decode_call_cached(SW, SEG, n_blocks, INTERPRET)


@lru_cache(maxsize=None)
def _decode_call_cached(SW: int, SEG: int, n_blocks: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _build_kernel(SW, SEG)
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, SW, SUBS, 128), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBS, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBS, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, SEG // 4, SUBS, 128), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBS, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, SEG // 4, SUBS, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n_blocks, SUBS, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((96, SUBS, 128), jnp.uint32)],
        # the bf16 shared profile fits the 16MB default, but fp8/fp32
        # shared profiles at 32KB chunks need more (fused_vmem_ok gates)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )
    return jax.jit(call)


# ---------------------------------------------------------------------------
# host + device glue
# ---------------------------------------------------------------------------

def row_tiles_for(max_bytes: int) -> int:
    """512-byte row tiles per stream: the stream + 576B slack (sub-tile
    alignment up to 511B + >=64B of index-safe margin below the start)."""
    return -(-(int(max_bytes) + 576) // 512)


def fused_vmem_ok(max_stream_bytes: int, seg: int) -> bool:
    """Whether the double-buffered sbuf + out blocks fit the kernel's
    64MB scoped-VMEM budget (e.g. fp8's single-plane 128KB chunks give
    seg=32768 and ~70MB blocks — those take the XLA fallback decoder)."""
    SW = 128 * row_tiles_for(max_stream_bytes)
    return 2 * (SW + seg // 4) * SUBS * 512 <= 80 * 1024 * 1024


@lru_cache(maxsize=None)
def _prep_call(SW: int, n_rows: int):
    """jitted: tile-gather stream rows and transpose to the kernel's
    [n_blocks, SW, 8, 128] lane-major layout."""
    import jax
    import jax.numpy as jnp

    from . import pallas_gather

    RT = SW // 128

    def prep(region, tile_starts):
        tiles = pallas_gather.to_tiles(
            jnp.concatenate([jnp.zeros(512 * RT, jnp.uint8), region])
        )
        rows = pallas_gather.gather_rows(tiles, tile_starts, RT)  # [n, SW]
        return rows.reshape(n_rows // BLOCK, SUBS, 128, SW).transpose(0, 3, 1, 2)

    return jax.jit(prep)


def stream_row_geometry(ends: np.ndarray, SW: int):
    """Per-stream tile starts (in the RT-tile front-padded payload) and
    sentinel bit positions within the row."""
    RT = SW // 128
    e_pad = ends.astype(np.int64) + 512 * RT
    te = -(-e_pad // 512)
    tile_start = (te - RT).astype(np.int32)
    end_in_row = e_pad - 512 * (te - RT)
    return tile_start, end_in_row


def decode_shared_table(
    region: np.ndarray,
    stream_starts: np.ndarray,
    stream_lens: np.ndarray,
    tbl8: np.ndarray,
    seg: int,
):
    """Decode S equal-output streams sharing one <=8-bit table.

    ``region`` is the flat container payload (host uint8); streams live at
    ``[start, start+len)``.  Returns a device array [S, seg] uint8 plus a
    validation: raises if any stream did not consume its bits exactly.
    """
    import jax.numpy as jnp

    S = int(stream_starts.size)
    if S == 0:
        return jnp.zeros((0, seg), jnp.uint8)
    ends = (stream_starts + stream_lens).astype(np.int64)
    last = region[ends - 1]
    if np.any(last == 0):
        raise ValueError("corrupt bitstream: missing sentinel bit")
    SW = 128 * row_tiles_for(int(stream_lens.max()))
    seg = int(seg)

    S_pad = -(-S // BLOCK) * BLOCK
    n_blocks = S_pad // BLOCK

    tile_start, end_in_row = stream_row_geometry(ends, SW)
    ts = np.zeros(S_pad, dtype=np.int32)
    ts[:S] = tile_start
    msb = np.floor(np.log2(last.astype(np.int64))).astype(np.int64)
    p0 = np.full(S_pad, 8 * (512 * (SW // 128) - 1), dtype=np.int32)
    p0[:S] = (8 * (end_in_row - 1) + msb).astype(np.int32)

    blocks = _prep_call(SW, S_pad)(jnp.asarray(region), jnp.asarray(ts))
    p0_dev = jnp.asarray(p0.reshape(n_blocks, SUBS, 128))

    out, pend = _decode_call(SW, seg, n_blocks)(blocks, p0_dev, jnp.asarray(tbl8))

    pend_np = np.asarray(pend).reshape(-1)[:S]
    want_end = (8 * (end_in_row - stream_lens)).astype(np.int64)
    if not np.array_equal(pend_np.astype(np.int64), want_end):
        bad = int(np.nonzero(pend_np.astype(np.int64) != want_end)[0][0])
        raise ValueError(
            f"corrupt HUF stream {bad} (not fully consumed: "
            f"pos {int(pend_np[bad])} != {int(want_end[bad])})"
        )

    # [n_blocks, seg//4, 8, 128] LE-packed -> [S, seg] bytes
    from . import jax_transforms

    w = out.transpose(0, 2, 3, 1).reshape(S_pad, seg // 4)
    return jax_transforms.bitcast_merge(w, jnp.uint8)[:S]
