"""Pallas TPU kernel: lockstep Huffman decode with PER-CELL tables.

This is the fast path for containers the *reference library* produces: every
(plane, chunk) cell carries its own Huffman table with tableLog up to 11/12
(reference csrc/zipnn_core.c:366 ``HUF_compress`` per chunk, decoded at
:807).  The shared-table kernel (ops/pallas_huf.py) resolves symbols with
one in-row table gather, which cannot vary per lane — a TPU gather reads
*one table row per sublane*, and 2048 lockstep streams span 512 different
cells.  This kernel therefore splits symbol resolution in two:

* **In-kernel: code LENGTH via a boundary compare-chain.**  The canonical
  dtable fills weights in ascending order (ops/entropy/huf.py
  ``build_dtable``), so nb_bits is non-increasing in the tableLog-bit peek
  index ``d``.  That makes ``nb = 1 + sum_m [d < C_m]`` with at most
  TLOG-1 per-lane boundary registers ``C_m`` — per-lane *data*, which TPUs
  handle natively, unlike per-lane tables.  Cells with smaller tableLog are
  pre-scaled into the common TLOG-bit domain on the host.  Only nb feeds
  the serial bit-consumption chain; the compares are mutually independent,
  so the added latency is one compare plus a log-depth add tree.
* **Post-pass: SYMBOL via per-sublane table pages.**  The kernel emits the
  16-bit ``d`` indices; a second, embarrassingly parallel kernel maps them
  to bytes by laying one cell per *sublane row* — exactly the granularity
  at which ``dynamic_gather`` supports distinct tables — with the 2^TLOG
  u8 entries packed four-per-word into TLOG-dependent page rows.

Scaling to the reference's default 256 KB chunks (streams up to ~64 KB)
required two more structural changes over the shared kernel:

* **Output streaming.**  The d-output for one grid block is up to ~130 MB;
  the grid gains a parts dimension, the out block covers one part, and the
  decode state (bit containers, window bases, w8) carries across parts in
  VMEM scratch.
* **A W4 window level on a static cadence.**  The per-lane select-scan
  that slides W3 from the stream buffer costs O(SW/32) selects *per
  period* regardless of how rarely a lane actually slides (lockstep code
  is masked, not skipped).  W4 (544 rows) slides by 256 once per part —
  a static schedule sized for the worst-case drain (<= 256 words per 1024
  symbols) — so the expensive sbuf scan amortizes to ~SW/1024 selects per
  symbol and W3 scans only W4's 17 aligned candidates.

The stream buffer itself (up to ~70 MB per grid block) is DMA'd from HBM
into VMEM scratch once per block (~90 us against ~30 ms of decode).
"""
from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

import numpy as np

from .entropy import huf

TLOG_CAP = 12  # format maximum (HUF_TABLELOG_MAX)
SUBS = 16
BLOCK = SUBS * 128
PART = 1024  # symbols per output part (and W4 slide cadence)
# W4 geometry per rate class.  The window-slide cadences must cover the
# worst-case LOCAL drain between refresh points; the base class provisions
# for 8 bits/symbol (one W3 slide per period, like the <=8-bit shared
# kernel), the rate12 class for the format maximum of 12 bits/symbol
# (two W3 slides per period, double-depth W4 steps).  The plan picks the
# class from the exact stream lengths; an in-kernel starvation flag is the
# correctness backstop for freak local spikes in the base class.
W4_GEOM = {False: (640, 256, 288), True: (1056, 512, 544)}  # rows, step, margin
W4_ROWS, W4_STEP, W4_MARGIN = W4_GEOM[False]  # base-class aliases (sim/tests)
RATE12_BITS = 6.0  # streams averaging above this use the rate12 class
W4_MIN_SW = 1024  # enable W4 above this stream width (words)
STARVED = -(1 << 30)  # pend marker: window starvation, retry with rate12

INTERPRET = False


# ---------------------------------------------------------------------------
# host: per-cell table preparation
# ---------------------------------------------------------------------------

def cell_decode_tables(
    headers: Sequence[bytes], tlog_k: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse per-cell weight headers into kernel inputs.

    Returns (bounds [n_cells, tlog_k-1] int32 in the tlog_k-bit d-domain,
    sym_pages [n_cells, 2^tlog_k // 4] uint32 (4 symbols per word), tlogs
    [n_cells]).  Identical headers share the parse via a cache.
    """
    n = len(headers)
    bounds = np.empty((n, tlog_k - 1), dtype=np.int32)
    pages = np.empty((n, (1 << tlog_k) // 4), dtype=np.uint32)
    tlogs = np.empty(n, dtype=np.int32)
    cache = {}
    for i, hdr in enumerate(headers):
        got = cache.get(hdr)
        if got is None:
            weights, rank_stats, tlog, _, _ = huf.read_stats(hdr)
            if tlog > tlog_k:
                raise ValueError(f"tableLog {tlog} > kernel domain {tlog_k}")
            sym_t, nb_t = huf.build_dtable(weights, rank_stats, tlog)
            got = _expand_cell(sym_t, nb_t, tlog, tlog_k)
            cache[hdr] = got
        bounds[i], pages[i], tlogs[i] = got
    return bounds, pages, tlogs


def _expand_cell(sym_t, nb_t, tlog: int, tlog_k: int):
    scale = tlog_k - tlog
    # nb_t is non-increasing in d (canonical fill, longest codes first);
    # C_m = first d (scaled) with nb <= m, or 2^tlog_k when none exists —
    # then nb = 1 + sum_m [d < C_m] for m in 1..tlog_k-1.
    neg = -nb_t.astype(np.int32)
    firsts = np.searchsorted(neg, -np.arange(1, tlog_k), side="left")
    bounds = (firsts.astype(np.int64) << scale).astype(np.int32)
    sym12 = np.repeat(sym_t, 1 << scale)  # [2^tlog_k] u8
    p = sym12.reshape(-1, 4).astype(np.uint32)
    pages = p[:, 0] | (p[:, 1] << 8) | (p[:, 2] << 16) | (p[:, 3] << 24)
    return bounds, pages, np.int32(tlog)


# ---------------------------------------------------------------------------
# decode kernel (d-index output)
# ---------------------------------------------------------------------------

def _build_kernel(SW: int, SEG: int, TLOG: int, use_w4: bool, rate12: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert SW >= 256 and SW % 256 == 0, SW
    assert SEG % 128 == 0, SEG
    U = jnp.uint32
    I = jnp.int32
    SW32 = SW // 32
    SW256 = SW // 256
    W4R, W4S, W4M = W4_GEOM[rate12]
    Q3LO = W4M >> 5
    Q3HI = (W4M + 256) >> 5           # init fill candidate range (exclusive)
    Q3MAX = ((W4M + W4S - 32) >> 5) + 1  # W3-slide candidate range (exclusive)
    W3_PASSES = 2 if rate12 else 1
    # W3 slide threshold: the margin must cover a full period's drain
    # (48 words at 12 bits/symbol) so the w8 fetch offset never goes
    # negative mid-period; 36 suffices at 8 bits/symbol (32-word drain)
    W3T = 52 if rate12 else 36
    Q2MAX = ((W3T + 32 - 4) >> 2) + 1  # w8-fetch candidate range (exclusive)
    part = min(PART, SEG)
    n_parts = SEG // part
    periods_per_part = part // 128

    def kernel(p0_ref, cbnd_ref, sbuf_hbm, out_ref, pend_ref,
               sbuf_ref, w3_ref, w4_ref, carry_u, carry_i, sem):
        SHIFT = U(32 - TLOG)
        b = pl.program_id(0)
        t = pl.program_id(1)
        cbnd = [cbnd_ref[0, m, :, :] for m in range(TLOG - 1)]

        def w4_row(m):
            return w4_ref[m, :, :] if use_w4 else None

        # ---- per-block init (part 0) --------------------------------------
        @pl.when(t == 0)
        def _init():
            dma = pltpu.make_async_copy(sbuf_hbm.at[b], sbuf_ref, sem)
            dma.start()
            dma.wait()

            p0 = p0_ref[0, :, :].astype(I)
            wtop = (p0 - 1) >> 5
            base2 = ((wtop >> 2) << 2) - 4   # w8 base, aligned 4
            base3 = ((base2 - 36) >> 5) << 5  # W3 base, aligned 32
            if use_w4:
                base4 = ((base3 - W4M) >> 8) << 8  # aligned 256
                c4 = jnp.maximum(base4, 0) >> 8
                for m in range(W4R):
                    row = sbuf_ref[min(m, SW - 1), :, :]
                    for cc in range(1, SW256):
                        row = jnp.where(
                            c4 == cc, sbuf_ref[min(cc * 256 + m, SW - 1), :, :], row
                        )
                    w4_ref[m, :, :] = row
                q3 = jnp.maximum(base3 - base4, 0) >> 5  # in [Q3LO, Q3HI)
                for m in range(96):
                    row = w4_ref[min(Q3LO * 32 + m, W4R - 1), :, :]
                    for qq in range(Q3LO + 1, Q3HI):
                        row = jnp.where(
                            q3 == qq, w4_ref[min(qq * 32 + m, W4R - 1), :, :], row
                        )
                    w3_ref[m, :, :] = row
            else:
                base4 = base3  # unused
                c3 = jnp.maximum(base3, 0) >> 5
                for m in range(96):
                    row = sbuf_ref[min(m, SW - 1), :, :]
                    for cc in range(1, SW32):
                        row = jnp.where(
                            c3 == cc, sbuf_ref[min(cc * 32 + m, SW - 1), :, :], row
                        )
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

            wtop_rel = wtop - base2
            w_a = w8sel(wtop_rel)
            w_b = w8sel(wtop_rel - 1)
            s = (I(32) * (wtop + 1) - p0).astype(U)
            hi = (w_a << s) | jnp.where(s == 0, (w_a >> U(16)) >> U(16), w_b >> (U(32) - s))
            lo = w_b << s
            carry_u[0, :, :] = hi
            carry_u[1, :, :] = lo
            for k in range(8):
                carry_u[2 + k, :, :] = w8[k]
            carry_i[0, :, :] = I(64) - s.astype(I)
            carry_i[1, :, :] = p0
            carry_i[2, :, :] = wtop - 2
            carry_i[3, :, :] = base2
            carry_i[4, :, :] = base3
            carry_i[5, :, :] = base4
            carry_i[6, :, :] = jnp.zeros((SUBS, 128), I)  # starvation flag

        # ---- one part: W4 slide + periods_per_part decode periods ---------
        hi = carry_u[0, :, :]
        lo = carry_u[1, :, :]
        w8 = [carry_u[2 + k, :, :] for k in range(8)]
        navail = carry_i[0, :, :]
        p = carry_i[1, :, :]
        wpos = carry_i[2, :, :]
        base2 = carry_i[3, :, :]
        base3 = carry_i[4, :, :]
        base4 = carry_i[5, :, :]
        starv = carry_i[6, :, :]

        if use_w4:
            # static-cadence W4 slide: at every part boundary after the
            # first, each lane slides 0 or W4_STEP rows.  Margins: base3 -
            # base4 stays in [32, 544) given <= 256 words drained per part.
            @pl.when(t > 0)
            def _slide4():
                b4 = carry_i[5, :, :]
                b3 = carry_i[4, :, :]
                slide4 = (b3 - b4) < W4M
                nbase4 = jnp.where(slide4, b4 - W4S, b4)
                # SIGNED candidate: with W4S > 256, base4 can land at -256
                # (alignment is mod 256) and rows m >= 256 then hold words
                # m - 256 >= 0 that WILL be consumed — the max(.,0) clamp
                # would silently fetch word m there instead.  cc <= -2
                # rows are all below the buffer (junk, never consumed) and
                # safely take the cc == -1 content.
                c4 = nbase4 >> 8
                for m in range(W4R - 1, W4S - 1, -1):
                    w4_ref[m, :, :] = jnp.where(
                        slide4, w4_ref[m - W4S, :, :], w4_ref[m, :, :]
                    )
                for m in range(W4S - 1, -1, -1):
                    fetched = sbuf_ref[min(max(m - 256, 0), SW - 1), :, :]
                    for cc in range(0, SW256):
                        fetched = jnp.where(
                            c4 == cc, sbuf_ref[min(cc * 256 + m, SW - 1), :, :], fetched
                        )
                    w4_ref[m, :, :] = jnp.where(slide4, fetched, w4_ref[m, :, :])
                carry_i[5, :, :] = nbase4

            base4 = carry_i[5, :, :]

        def period(outer, carry):
            hi, lo, navail, p, wpos, base2, base3, starv, *w8 = carry
            w8 = list(w8)

            # ---- W3 slide: per period, per-lane 0 or 32 rows per pass ----
            # (two passes in the rate12 class: demand is up to 48 words per
            # 128 symbols at 12 bits/symbol)
            for _pass in range(W3_PASSES):
                slide3 = (base2 - base3) < W3T
                nbase3 = jnp.where(slide3, base3 - 32, base3)
                for m in range(95, 31, -1):
                    w3_ref[m, :, :] = jnp.where(slide3, w3_ref[m - 32, :, :], w3_ref[m, :, :])
                if use_w4:
                    q3r = nbase3 - base4
                    starv = starv | (slide3 & (q3r < 0)).astype(I)
                    q3 = jnp.maximum(q3r, 0) >> 5
                    for m in range(31, -1, -1):
                        fetched = w4_ref[m, :, :]
                        for qq in range(1, Q3MAX):
                            fetched = jnp.where(
                                q3 == qq, w4_ref[min(qq * 32 + m, W4R - 1), :, :], fetched
                            )
                        w3_ref[m, :, :] = jnp.where(slide3, fetched, w3_ref[m, :, :])
                else:
                    c3 = jnp.maximum(nbase3, 0) >> 5
                    for m in range(31, -1, -1):
                        fetched = sbuf_ref[m, :, :]
                        for cc in range(1, SW32):
                            fetched = jnp.where(
                                c3 == cc, sbuf_ref[cc * 32 + m, :, :], fetched
                            )
                        w3_ref[m, :, :] = jnp.where(slide3, fetched, w3_ref[m, :, :])
                base3 = nbase3

            for sub in range(16):
                # ---- w8 slide: every 8 symbols, per-lane 0 or 4 words ----
                slide2 = (wpos - base2) < 4
                nbase2 = jnp.where(slide2, base2 - 4, base2)
                q2r = nbase2 - base3
                starv = starv | (
                    slide2 & ((q2r >= 4 * (Q2MAX - 1) + 4) | (q2r < 0))
                ).astype(I)
                q2 = jnp.maximum(q2r, 0) >> 2
                for k in range(7, 3, -1):
                    w8[k] = jnp.where(slide2, w8[k - 4], w8[k])
                for k in range(3, -1, -1):
                    fetched = w3_ref[k, :, :]
                    for q in range(1, Q2MAX):
                        fetched = jnp.where(q2 == q, w3_ref[4 * q + k, :, :], fetched)
                    w8[k] = jnp.where(slide2, fetched, w8[k])
                base2 = nbase2

                def nb_of(d):
                    # thermometer count via a balanced add tree (the
                    # compares are independent; tree depth 4 beats the
                    # serial 11-add chain on the critical path)
                    cs = [(d < cbnd[m]).astype(I) for m in range(TLOG - 1)]
                    while len(cs) > 1:
                        nxt = [cs[i] + cs[i + 1] for i in range(0, len(cs) - 1, 2)]
                        if len(cs) % 2:
                            nxt.append(cs[-1])
                        cs = nxt
                    one = jnp.ones((SUBS, 128), I)
                    return one + cs[0] if cs else one

                for pair in range(4):
                    # ---- two symbols per step in every lane ---------------
                    # d2 comes from the PRE-shift hi: nb1 + TLOG <= 24 < 32,
                    # so no lo bits can reach the peek — bit-identical to
                    # shifting first.  One combined hi/lo consume per pair
                    # halves the serial shift chain per output byte (the
                    # lockstep analogue of FSE's X2 double-symbol decode).
                    d1 = (hi >> SHIFT).astype(I)
                    nb1 = nb_of(d1)
                    d2 = (
                        (hi >> (U(32 - TLOG) - nb1.astype(U))).astype(I)
                        & I((1 << TLOG) - 1)
                    )
                    nb2 = nb_of(d2)
                    nbs = nb1 + nb2
                    nbu = nbs.astype(U)
                    hi = (hi << nbu) | (lo >> (U(32) - nbu))
                    lo = lo << nbu
                    navail = navail - nbs
                    p = p - nbs

                    # masked refill once per pair: a pair drains <= 24 bits;
                    # navail >= 21 at every first peek (second peeks are
                    # covered by the zero-padded-below-start convention,
                    # exactly as in the single-symbol schedule)
                    need = navail <= 32
                    kk = wpos - base2
                    w = w8[0]
                    for k in range(1, 8):
                        w = jnp.where(kk == k, w8[k], w)
                    nau = navail.astype(U)
                    w_hi = jnp.where(navail < 32, w >> nau, U(0))
                    w_lo = w << (U(32) - nau)  # navail >= 9, shift < 32
                    hi = jnp.where(need, hi | w_hi, hi)
                    lo = jnp.where(need, lo | w_lo, lo)
                    navail = jnp.where(need, navail + 32, navail)
                    wpos = jnp.where(need, wpos - 1, wpos)

                    row = outer * 64 + sub * 4 + pair
                    out_ref[0, row, :, :] = (
                        d1.astype(U) | (d2.astype(U) << U(16))
                    )

            return (hi, lo, navail, p, wpos, base2, base3, starv, *w8)

        carry = (hi, lo, navail, p, wpos, base2, base3, starv, *w8)
        carry = jax.lax.fori_loop(0, periods_per_part, period, carry)
        hi, lo, navail, p, wpos, base2, base3, starv, *w8 = carry
        carry_u[0, :, :] = hi
        carry_u[1, :, :] = lo
        for k in range(8):
            carry_u[2 + k, :, :] = w8[k]
        carry_i[0, :, :] = navail
        carry_i[1, :, :] = p
        carry_i[2, :, :] = wpos
        carry_i[3, :, :] = base2
        carry_i[4, :, :] = base3
        carry_i[6, :, :] = starv

        @pl.when(t == n_parts - 1)
        def _fin():
            # a set starvation flag marks the lane's output invalid; the
            # caller retries the container with the rate12 class
            pend_ref[0, :, :] = jnp.where(
                carry_i[6, :, :] > 0, carry_i[1, :, :] + I(STARVED),
                carry_i[1, :, :],
            )

    return kernel, n_parts, part


def _decode_call(SW: int, SEG: int, TLOG: int, n_blocks: int, rate12: bool = False):
    return _decode_call_cached(SW, SEG, TLOG, n_blocks, rate12, INTERPRET)


@lru_cache(maxsize=None)
def _decode_call_cached(
    SW: int, SEG: int, TLOG: int, n_blocks: int, rate12: bool, interpret: bool
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    use_w4 = SW >= W4_MIN_SW
    kernel, n_parts, part = _build_kernel(SW, SEG, TLOG, use_w4, rate12)
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_parts),
        in_specs=[
            pl.BlockSpec((1, SUBS, 128), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, TLOG - 1, SUBS, 128), lambda b, t: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # sbuf stays in HBM
        ],
        out_specs=[
            pl.BlockSpec(
                (1, part // 2, SUBS, 128), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, SUBS, 128), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, SEG // 2, SUBS, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n_blocks, SUBS, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SW, SUBS, 128), jnp.uint32),   # stream buffer
            pltpu.VMEM((96, SUBS, 128), jnp.uint32),    # W3
            pltpu.VMEM((W4_GEOM[rate12][0] if use_w4 else 8, SUBS, 128), jnp.uint32),
            pltpu.VMEM((10, SUBS, 128), jnp.uint32),    # carry: hi, lo, w8
            pltpu.VMEM((7, SUBS, 128), jnp.int32),      # carry: scalars + starv
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )
    return jax.jit(call)


def vmem_ok(max_stream_bytes: int, seg: int, rate12: bool = True) -> bool:
    """Whether one grid block's buffers fit the 110MB scoped-VMEM budget
    (checked for the given rate class; rate12 is the larger one)."""
    SW = sw_for(max_stream_bytes)
    part = min(PART, seg)
    sbuf = SW * SUBS * 512
    out2 = 2 * (part // 2) * SUBS * 512
    w4 = (W4_GEOM[rate12][0] if SW >= W4_MIN_SW else 8) * SUBS * 512
    return sbuf + out2 + w4 + (96 + 17) * SUBS * 512 <= 100 * 1024 * 1024


def sw_for(max_bytes: int) -> int:
    from . import pallas_huf

    SW = 128 * pallas_huf.row_tiles_for(max_bytes)
    return -(-SW // 256) * 256


# ---------------------------------------------------------------------------
# post-pass kernel: d-index -> symbol via per-sublane cell tables
# ---------------------------------------------------------------------------

CELLS_PER_GROUP = SUBS  # one cell per sublane row


def _build_post_kernel(W: int, PAGES: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    U = jnp.uint32
    I = jnp.int32
    assert W % 256 == 0, W

    def kernel(dw_ref, tbl_ref, out_ref):
        lane = jax.lax.broadcasted_iota(I, (SUBS, 128), 1)
        gidx = (2 * lane) & 127
        tpages = [tbl_ref[0, :, pg * 128 : (pg + 1) * 128] for pg in range(PAGES)]

        def sym(d):
            q = d >> 2
            li = q & 127
            page = q >> 7
            g = jnp.take_along_axis(tpages[0], li, axis=1)
            for pg in range(1, PAGES):
                g = jnp.where(
                    page == pg, jnp.take_along_axis(tpages[pg], li, axis=1), g
                )
            return (g.astype(U) >> ((d.astype(U) & U(3)) << U(3))) & U(0xFF)

        for c in range(W // 256):
            w0 = dw_ref[0, :, c * 256 : c * 256 + 128]
            w1 = dw_ref[0, :, c * 256 + 128 : c * 256 + 256]
            h0 = sym((w0 & U(0xFFFF)).astype(I)) | (sym((w0 >> U(16)).astype(I)) << U(8))
            h1 = sym((w1 & U(0xFFFF)).astype(I)) | (sym((w1 >> U(16)).astype(I)) << U(8))
            e0 = jnp.take_along_axis(h0, gidx, axis=1)
            o0 = jnp.take_along_axis(h0, gidx + 1, axis=1)
            e1 = jnp.take_along_axis(h1, gidx, axis=1)
            o1 = jnp.take_along_axis(h1, gidx + 1, axis=1)
            sel = lane < 64
            lo16 = jnp.where(sel, e0, e1)
            hi16 = jnp.where(sel, o0, o1)
            out_ref[0, :, c * 128 : (c + 1) * 128] = lo16 | (hi16 << U(16))

    return kernel


def _post_call(W: int, PAGES: int, n_groups: int):
    return _post_call_cached(W, PAGES, n_groups, INTERPRET)


@lru_cache(maxsize=None)
def _post_call_cached(W: int, PAGES: int, n_groups: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _build_post_kernel(W, PAGES)
    call = pl.pallas_call(
        kernel,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, SUBS, W), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, SUBS, PAGES * 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, SUBS, W // 2), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, SUBS, W // 2), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )
    return jax.jit(call)


def post_map_symbols(dwords, pages_dev, seg: int, tlog_k: int):
    """Map the decode kernel's packed d-indices to symbol words.

    ``dwords``: [S_pad, seg//2] uint32 (2 d's per word, stream-major, cells
    = consecutive groups of 4 streams).  ``pages_dev``: [G_pad, 2^tlog_k//4]
    uint32 with G_pad = S_pad//4.  Returns [S_pad, seg//4] uint32 plane
    words (4 symbols per word, LE).
    """
    import jax.numpy as jnp

    S_pad = dwords.shape[0]
    G_pad = S_pad // 4
    assert G_pad % CELLS_PER_GROUP == 0
    n_groups = G_pad // CELLS_PER_GROUP
    W = 4 * (seg // 2)
    PAGES = (1 << tlog_k) // 512
    dw = dwords.reshape(n_groups, CELLS_PER_GROUP, W)
    tb = pages_dev.reshape(n_groups, CELLS_PER_GROUP, PAGES * 128)
    out = _post_call(W, PAGES, n_groups)(dw, tb)
    return out.reshape(S_pad, seg // 4)


# ---------------------------------------------------------------------------
# host + device glue
# ---------------------------------------------------------------------------

def build_lane_inputs(
    starts: np.ndarray, lens: np.ndarray, region: np.ndarray,
    bounds: np.ndarray, pages: np.ndarray, cell_of_stream: np.ndarray,
    SW: int, tlog_k: int,
):
    """Per-lane kernel inputs from per-stream geometry.

    Returns (row_starts [S_pad], p0 [n_blocks,SUBS,128], cbnd
    [n_blocks,tlog_k-1,SUBS,128], pages_pad [G_pad, 2^tlog_k//4],
    end_in_row [S]).  Padding lanes get all-zero boundaries (nb=1 per
    symbol) and in-bounds geometry so they decode garbage harmlessly.
    """
    from . import pallas_huf

    S = int(starts.size)
    S_pad = -(-S // BLOCK) * BLOCK
    n_blocks = S_pad // BLOCK
    ends = (starts + lens).astype(np.int64)
    last = region[ends - 1]
    if np.any(last == 0):
        raise ValueError("corrupt bitstream: missing sentinel bit")
    tile_start, end_in_row = pallas_huf.stream_row_geometry(ends, SW)
    row_starts = np.zeros(S_pad, dtype=np.int32)
    row_starts[:S] = tile_start
    msb = np.floor(np.log2(last.astype(np.int64))).astype(np.int64)
    p0 = np.full(S_pad, 8 * (4 * SW - 1), dtype=np.int32)
    p0[:S] = (8 * (end_in_row - 1) + msb).astype(np.int32)
    cbnd = np.zeros((S_pad, tlog_k - 1), dtype=np.int32)
    cbnd[:S] = bounds[cell_of_stream]
    G_pad = S_pad // 4
    pages_pad = np.zeros((G_pad, (1 << tlog_k) // 4), dtype=np.uint32)
    pages_pad[: pages.shape[0]] = pages
    return (
        row_starts,
        p0.reshape(n_blocks, SUBS, 128),
        np.ascontiguousarray(
            cbnd.reshape(n_blocks, SUBS, 128, tlog_k - 1).transpose(0, 3, 1, 2)
        ),
        pages_pad,
        end_in_row,
    )


def decode_cells(
    region: np.ndarray,
    stream_starts: np.ndarray,
    stream_lens: np.ndarray,
    headers,
    cell_of_stream: np.ndarray,
    seg: int,
):
    """Decode S equal-output streams with per-cell tables (tableLog <= 12).

    ``region`` is the flat payload (host uint8); stream i covers
    ``[start, start+len)`` and uses cell ``cell_of_stream[i]``'s table from
    ``headers``.  Returns a device array [S, seg] uint8; raises if any
    stream does not consume its bits exactly.
    """
    import jax.numpy as jnp

    from . import pallas_gather

    S = int(stream_starts.size)
    if S == 0:
        return jnp.zeros((0, seg), jnp.uint8)
    tlogs_probe = [huf.read_stats(h)[2] for h in {bytes(h) for h in headers}]
    tlog_k = max(9, max(tlogs_probe))
    bounds, pages, _ = cell_decode_tables(headers, tlog_k)
    SW = sw_for(int(stream_lens.max()))
    row_starts, p0, cbnd, pages_pad, end_in_row = build_lane_inputs(
        stream_starts, stream_lens, region, bounds, pages,
        np.asarray(cell_of_stream), SW, tlog_k,
    )
    S_pad = row_starts.size
    n_blocks = S_pad // BLOCK
    RT = SW // 128

    tiles = pallas_gather.to_tiles(
        jnp.concatenate([jnp.zeros(512 * RT, jnp.uint8), jnp.asarray(region)])
    )
    words = pallas_gather.gather_rows(tiles, jnp.asarray(row_starts), RT)
    blocks = words.reshape(n_blocks, SUBS, 128, SW).transpose(0, 3, 1, 2)
    rate12 = 8.0 * float(stream_lens.max()) / seg > RATE12_BITS
    for attempt in dict.fromkeys((rate12, True)):
        dw, pend = _decode_call(SW, seg, tlog_k, n_blocks, attempt)(
            jnp.asarray(p0), jnp.asarray(cbnd), blocks
        )
        pend_np = np.asarray(pend).reshape(-1)[:S]
        if not np.any(pend_np < -(1 << 29)):
            break
        if attempt:
            raise RuntimeError(
                "window starvation under rate12 provisioning (kernel bug)"
            )
    want_end = (8 * (end_in_row - stream_lens)).astype(np.int64)
    if not np.array_equal(pend_np.astype(np.int64), want_end):
        bad = int(np.nonzero(pend_np.astype(np.int64) != want_end)[0][0])
        raise ValueError(
            f"corrupt HUF stream {bad} (not fully consumed: "
            f"pos {int(pend_np[bad])} != {int(want_end[bad])})"
        )
    dwS = dw.transpose(0, 2, 3, 1).reshape(S_pad, seg // 2)
    ow = post_map_symbols(dwS, jnp.asarray(pages_pad), seg, tlog_k)
    from . import jax_transforms

    return jax_transforms.bitcast_merge(ow, jnp.uint8)[:S]


def cell_decode_tables_payload(payload_np, offsets, sizes):
    """Batch table prep straight from payload offsets (plan fast path).

    Uses the native C++ batch header parser when available (~100 ms for a
    Llama-scale container's ~65k distinct tables vs tens of seconds for
    the per-header Python loop), then expands bounds/pages vectorized.
    Returns (bounds [n, tlog_k-1] int32, pages [n, 2^tlog_k//4] uint32,
    tlog_k).  Raises ValueError on a corrupt header.
    """
    try:
        from .. import native
    except Exception:
        native = None
    n = int(np.asarray(offsets).size)
    if native is None or n == 0:
        headers = [
            bytes(payload_np[int(o) : int(o + c)])
            for o, c in zip(offsets, sizes)
        ]
        tlog_k = max(
            [9] + [huf.read_stats(h)[2] for h in dict.fromkeys(headers)]
        )
        bounds, pages, _ = cell_decode_tables(headers, tlog_k)
        return bounds, pages, tlog_k

    # two native phases: weights parse (per-header FSE decode) then the
    # closed-form bounds + page fill in the common tlog_k domain — no
    # 4096-wide intermediate tables, no numpy per-entry passes
    weights, tlogs = native.parse_dweights(payload_np, offsets, sizes)
    tlog_k = max(9, int(tlogs.max()))
    bounds, pages = native.expand_cells(weights, tlogs, tlog_k)
    return bounds, pages, tlog_k
