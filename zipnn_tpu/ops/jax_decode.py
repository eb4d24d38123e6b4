"""Device decompress pipeline for the ``engine="tpu"`` codec.

Fast-path architecture (round 3; replaces the per-batch re-planning the
round-2 review flagged as the host wall):

* **One container-wide host plan.**  ``_parse_geometry`` + a plan object
  (:class:`_SharedPlan` / :class:`_PCPlan`) parse the chunk tables, slice
  every HUF cell's header/jump geometry vectorized, and batch-parse all
  per-cell decode tables (native C++) exactly once.  Per-batch kernel
  inputs are then cheap numpy slices.
* **One payload upload.**  The raw payload bytes go to the device once;
  guard padding and the u8->u32 lane restride happen on device at HBM
  bandwidth (``_tiles_call``).  Round 2 rebuilt and re-uploaded a
  zero-padded copy of the whole payload per batch.
* **Uniform batch geometry.**  Every batch is padded to the same
  (stored/rle/huf) cell capacities, so one compiled kernel serves all
  batches of a container — a 16 GB checkpoint pays one compile, not one
  per 512 MB batch.
* **Pipelined batches.**  Batch N+1's host planning and uploads overlap
  batch N's device decode (depth-2 in-flight window bounds device
  memory); stream-end validation is deferred to the drain.

Containers whose HUF blocks share one <=8-bit table (our
``huffman_table="shared"`` profile) take the Pallas lockstep kernel
(ops/pallas_huf.py); per-chunk-table containers — what the reference
library emits (csrc/zipnn_core.c:366/807) — take the boundary
compare-chain kernel (ops/pallas_huf_pc.py).  Anything else falls back to
the XLA lockstep decoder at the bottom of this file.

Reference equivalent: csrc/zipnn_core.c:881-1164 (decompress core).
"""
from __future__ import annotations

from functools import lru_cache
from typing import List, Optional

import numpy as np

from . import byte_group
from ..errors import CorruptChunkError
from .entropy import huf
from . import jax_entropy, jax_transforms, pallas_huf


def _jnp():
    import jax.numpy as jnp  # noqa: PLC0415 - keep jax import lazy

    return jnp


def _platform_is_tpu() -> bool:
    from . import jax_codec  # noqa: PLC0415 - FORCE_DEVICE_PATH lives there

    return jax_codec._platform_is_tpu()


class _PCStarved(Exception):
    """Internal: base-rate window provisioning starved on a local bit-rate
    spike.  ``cells`` carries the batch-local HUF-cell positions whose
    streams starved; the caller either patches those chunks host-side (the
    common case: a handful of text-like chunks inside a weights container)
    or retries the whole batch with the rate12 kernel class."""

    def __init__(self, cells: Optional[np.ndarray] = None):
        super().__init__("base-rate window starvation")
        self.cells = cells


# ---------------------------------------------------------------------------
# container geometry (host)
# ---------------------------------------------------------------------------

class _Geom:
    """Parsed container geometry: chunk tables, per-cell offsets/sizes and
    the stored/RLE/HUF cell classification over the full-chunk region."""

    __slots__ = (
        "payload_np", "mv", "num_buf", "chunk_size", "orig_size",
        "n_chunks", "full", "plane_bytes", "seg", "types",
        "cell_start", "cell_size", "cs", "sz",
        "stored_cells", "rle_cells", "huf_cells",
        "bit_reorder", "byte_reorder",
    )


def _parse_geometry(
    payload, num_buf, chunk_size, orig_size, bit_reorder, byte_reorder
) -> Optional[_Geom]:
    n_chunks = (orig_size + chunk_size - 1) // chunk_size
    if n_chunks == 0:
        return None
    from .. import codec  # noqa: PLC0415 - avoid import cycle

    g = _Geom()
    g.mv = memoryview(payload)
    g.payload_np = np.frombuffer(g.mv, dtype=np.uint8)
    g.num_buf = num_buf
    g.chunk_size = chunk_size
    g.orig_size = orig_size
    g.bit_reorder = bit_reorder
    g.byte_reorder = byte_reorder
    g.n_chunks = n_chunks
    g.full = n_chunks if orig_size == n_chunks * chunk_size else n_chunks - 1
    types, starts, data_start = codec.parse_tables(payload, num_buf, n_chunks)
    g.types = types
    g.plane_bytes = chunk_size // num_buf
    g.seg = g.plane_bytes // 4
    plane_base = np.zeros(num_buf, dtype=np.int64)
    for b in range(1, num_buf):
        plane_base[b] = plane_base[b - 1] + starts[b - 1, n_chunks]
    g.cell_start = data_start + plane_base[:, None] + starts[:, :-1]
    g.cell_size = starts[:, 1:] - starts[:, :-1]
    if g.full:
        t = types[:, : g.full]
        g.cs = g.cell_start[:, : g.full]
        g.sz = g.cell_size[:, : g.full]
        if np.any(t > 1):
            raise ValueError(f"unknown chunk type {int(t.max())}")
        if np.any(g.sz[t == 0] != g.plane_bytes):
            raise ValueError("raw chunk size mismatch")
        if np.any(g.sz[t == 1] > g.plane_bytes):
            raise ValueError("corrupt HUF block (larger than destination)")
        raw_mask = t == 0
        rle_mask = (t == 1) & (g.sz == 1)
        stored_mask = raw_mask | ((t == 1) & (g.sz == g.plane_bytes))
        huf_mask = (t == 1) & ~rle_mask & ~stored_mask
        g.stored_cells = np.nonzero(stored_mask)
        g.rle_cells = np.nonzero(rle_mask)
        g.huf_cells = np.nonzero(huf_mask)
    else:
        z = (np.zeros(0, np.int64), np.zeros(0, np.int64))
        g.cs = g.sz = None
        g.stored_cells = g.rle_cells = g.huf_cells = z
    return g


def _huf_stream_geometry(g: _Geom):
    """Vectorized header-length/jump-table slicing for every HUF cell.

    Returns (hcs, hsz, consumed, sstarts4 [n,4], slens4 [n,4]) or None when
    any cell's geometry is invalid — the caller then falls back to the
    generic path, which produces the precise located error.
    """
    hb, hc = g.huf_cells
    hcs = g.cs[hb, hc].astype(np.int64)
    hsz = g.sz[hb, hc].astype(np.int64)
    p = g.payload_np
    # header length is determined by its first byte (raw 4-bit weights vs
    # FSE-compressed), so slicing all headers is vectorizable
    b0 = p[hcs].astype(np.int64)
    consumed = np.where(b0 >= 128, 1 + (b0 - 127 + 1) // 2, 1 + b0)
    if not np.all(hsz > consumed + 6):
        return None
    jt = hcs + consumed
    l1 = p[jt].astype(np.int64) | (p[jt + 1].astype(np.int64) << 8)
    l2 = p[jt + 2].astype(np.int64) | (p[jt + 3].astype(np.int64) << 8)
    l3 = p[jt + 4].astype(np.int64) | (p[jt + 5].astype(np.int64) << 8)
    l4 = hsz - consumed - 6 - l1 - l2 - l3
    if not np.all((l1 > 0) & (l2 > 0) & (l3 > 0) & (l4 > 0)):
        return None
    s0 = jt + 6
    sstarts4 = np.stack([s0, s0 + l1, s0 + l1 + l2, s0 + l1 + l2 + l3], axis=1)
    slens4 = np.stack([l1, l2, l3, l4], axis=1)
    if np.any(p[(sstarts4 + slens4).reshape(-1) - 1] == 0):
        return None  # missing sentinel bit: generic path raises the error
    return hcs, hsz, consumed, sstarts4, slens4


# ---------------------------------------------------------------------------
# fused device pipelines
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _tiles_call(RT: int):
    """jitted: pad the payload (RT front guard tiles + end guard) and
    restride it to [X, 128] uint32 tiles ON DEVICE.

    The payload uploads once, raw; padding and the u8->u32 restride run at
    HBM bandwidth.  All batches of a container share the result.
    """
    import jax  # noqa: PLC0415

    jnp = _jnp()

    def f(region_u8):
        from . import pallas_gather  # noqa: PLC0415

        return pallas_gather.to_tiles(
            jnp.concatenate(
                [jnp.zeros(512 * RT, jnp.uint8), region_u8,
                 jnp.zeros(512, jnp.uint8)]
            )
        )

    return jax.jit(f)


@lru_cache(maxsize=None)
def _fused_fast_decode(
    SW: int,
    seg: int,
    B: int,
    num_buf: int,
    plane_bytes: int,
    byte_reorder: int,
    bit_reorder: int,
    n_stored: int,
    n_rle: int,
    n_huf: int,
):
    """One-dispatch device pipeline for a SHARED-table batch of B chunks.

    Right-aligned stream slicing, the Pallas lockstep decode, stored-plane
    gathering from the payload tiles, RLE fills, plane assembly (a row
    *gather*, ``all_rows[perm]``) and the byte-group combine all happen
    inside a single jit.  ``n_stored/n_rle/n_huf`` are per-batch
    *capacities*: every batch of a container is padded to the same counts
    so one compiled program serves them all.

    Returns (owords [B, chunk_words] uint32, pend [S_pad] int32).
    """
    import jax  # noqa: PLC0415
    import jax.numpy as jnp  # noqa: PLC0415

    S = n_huf * 4
    S_pad = -(-max(S, 1) // pallas_huf.BLOCK) * pallas_huf.BLOCK
    n_blocks = S_pad // pallas_huf.BLOCK
    kernel = pallas_huf._decode_call(SW, seg, n_blocks) if n_huf else None
    plane_words = plane_bytes // 4

    use_mono = num_buf in (1, 2) and plane_words % 128 == 0

    def run(tiles, row_starts, p0, tbl8, st_tiles, st_wsh, st_bsh, rle_vals, perm):
        from . import pallas_gather  # noqa: PLC0415

        RT = SW // 128
        rtp = plane_words // 128 + 2
        ow = None
        if n_huf:
            words = pallas_gather.gather_rows(tiles, row_starts, RT)  # [S_pad, SW]
            blocks = words.reshape(n_blocks, pallas_huf.SUBS, 128, SW).transpose(0, 3, 1, 2)
            out, pend = kernel(blocks, p0, tbl8)
            # LE-packed symbol words == plane words, stream-major
            ow = out.transpose(0, 2, 3, 1).reshape(S_pad, seg // 4)
            pend_flat = pend.reshape(-1)[:S]
        else:
            pend_flat = jnp.zeros((0,), jnp.int32)

        if use_mono:
            from . import pallas_combine  # noqa: PLC0415

            R = plane_words // 128
            hsrc = (
                ow.reshape(S_pad // 4, R, 128)
                if n_huf
                else jnp.zeros((1, R, 128), jnp.uint32)
            )
            owords = pallas_combine.combine_cells(
                hsrc, tiles, rle_vals, perm, st_tiles, st_wsh, st_bsh,
                B, num_buf, plane_words, n_stored, n_rle, bit_reorder,
            )
            return owords, pend_flat

        rows = []
        if n_stored:
            srows = pallas_gather.gather_rows(tiles, st_tiles, rtp)
            srows = pallas_gather.align_rows(srows, st_wsh, st_bsh)
            rows.append(srows[:, :plane_words])
        if n_rle:
            v = rle_vals.astype(jnp.uint32)
            v = v | (v << 8) | (v << 16) | (v << 24)
            rows.append(jnp.broadcast_to(v[:, None], (n_rle, plane_words)))
        if n_huf:
            rows.append(ow[:S].reshape(n_huf, plane_words))

        all_rows = rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)
        planes_words = all_rows[perm].reshape(B, num_buf, plane_words)
        owords = jax_transforms.combine_device(
            planes_words, num_buf, byte_reorder, bit_reorder
        )
        return owords, pend_flat

    return jax.jit(run)


@lru_cache(maxsize=None)
def _fused_pc_decode(
    SW: int,
    seg: int,
    B: int,
    num_buf: int,
    plane_bytes: int,
    byte_reorder: int,
    bit_reorder: int,
    n_stored: int,
    n_rle: int,
    n_huf: int,
    tlog_k: int,
    rate12: bool,
):
    """The per-cell-table sibling of :func:`_fused_fast_decode` — the path
    for containers the reference library produces (per-chunk
    ``HUF_compress`` tables, zipnn_core.c:366/807).  Same structure plus
    two extra stages: the boundary compare-chain kernel emits 16-bit
    dtable indices and the per-sublane post-pass maps them to symbol words
    (ops/pallas_huf_pc.py)."""
    import jax  # noqa: PLC0415
    import jax.numpy as jnp  # noqa: PLC0415

    from . import pallas_huf_pc as pc  # noqa: PLC0415

    S = n_huf * 4
    S_pad = -(-max(S, 1) // pc.BLOCK) * pc.BLOCK
    n_blocks = S_pad // pc.BLOCK
    kernel = pc._decode_call(SW, seg, tlog_k, n_blocks, rate12)
    plane_words = plane_bytes // 4

    # the fused mono-assembly kernel (ops/pallas_combine.py) replaces the
    # post-map + concat + perm-gather + combine XLA passes with one
    # streaming Pallas pass (per-chunk DMA of exactly the needed rows,
    # in-kernel d->symbol mapping, register interleave) — ~1.6 GB of HBM
    # traffic instead of ~4.4 GB at 768 MB output
    use_mono = num_buf in (1, 2) and plane_words % 128 == 0

    def run(tiles, row_starts, p0, cbnd, pages, st_tiles, st_wsh, st_bsh,
            rle_vals, perm):
        from . import pallas_gather  # noqa: PLC0415

        RT = SW // 128
        rtp = plane_words // 128 + 2
        words = pallas_gather.gather_rows(tiles, row_starts, RT)
        blocks = words.reshape(n_blocks, pc.SUBS, 128, SW).transpose(0, 3, 1, 2)
        dw, pend = kernel(p0, cbnd, blocks)
        dwS = dw.transpose(0, 2, 3, 1).reshape(S_pad, seg // 2)
        pend_flat = pend.reshape(-1)[:S]

        if use_mono:
            from . import pallas_combine  # noqa: PLC0415

            R = plane_words // 128
            G = S_pad // 4
            hsrc = dwS.reshape(G, R, 256)
            owords = pallas_combine.combine_cells(
                hsrc, tiles, rle_vals, perm, st_tiles, st_wsh, st_bsh,
                B, num_buf, plane_words, n_stored, n_rle, bit_reorder,
                pages=pages, tlog_k=tlog_k,
            )
            return owords, pend_flat

        rows = []
        if n_stored:
            srows = pallas_gather.gather_rows(tiles, st_tiles, rtp)
            srows = pallas_gather.align_rows(srows, st_wsh, st_bsh)
            rows.append(srows[:, :plane_words])
        if n_rle:
            v = rle_vals.astype(jnp.uint32)
            v = v | (v << 8) | (v << 16) | (v << 24)
            rows.append(jnp.broadcast_to(v[:, None], (n_rle, plane_words)))
        ow = pc.post_map_symbols(dwS, pages, seg, tlog_k)
        rows.append(ow[:S].reshape(n_huf, plane_words))

        all_rows = rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)
        planes_words = all_rows[perm].reshape(B, num_buf, plane_words)
        owords = jax_transforms.combine_device(
            planes_words, num_buf, byte_reorder, bit_reorder
        )
        return owords, pend_flat

    return jax.jit(run)


# ---------------------------------------------------------------------------
# fast-path plans (host-only; device args derived per batch)
# ---------------------------------------------------------------------------

class _SharedPlan:
    """Fast-path plan for shared-table containers (every HUF cell carries
    the same <=8-bit weight header) and for all-stored containers."""

    kind = "shared"
    BLOCK = pallas_huf.BLOCK

    @classmethod
    def build(cls, g: _Geom):
        if g.seg % 128:
            return None
        hb, hc = g.huf_cells
        p = cls()
        p.g = g
        p.n_huf_total = int(hb.size)
        if not hb.size:
            p.SW = 128  # no HUF gathers; front pad covers stored rows
            p.RT = 1
            p.sstarts4 = p.slens4 = None
            p.tbl8 = None
            return p
        geo = _huf_stream_geometry(g)
        if geo is None:
            return None
        hcs, hsz, consumed, sstarts4, slens4 = geo
        first = bytes(g.payload_np[int(hcs[0]) : int(hcs[0] + hsz[0])])
        try:
            weights, rank_stats, tlog, _, cons0 = huf.read_stats(first)
        except ValueError:
            return None
        if tlog > pallas_huf.TMAX:
            return None
        if not np.all(consumed == cons0):
            return None
        hdr = g.payload_np[int(hcs[0]) : int(hcs[0]) + cons0]
        idx = hcs[:, None] + np.arange(cons0)
        if not bool(np.all(g.payload_np[idx] == hdr)):
            return None
        if not pallas_huf.fused_vmem_ok(int(slens4.max()), g.seg):
            return None
        sym_t, nb_t = huf.build_dtable(weights, rank_stats, tlog)
        p.tbl8 = pallas_huf.expand_dtable8(sym_t, nb_t, tlog)
        p.sstarts4 = sstarts4
        p.slens4 = slens4
        p.SW = 128 * pallas_huf.row_tiles_for(int(slens4.max()))
        p.RT = p.SW // 128
        return p

    def fused_call(self, caps, B: int, force12: bool = False):
        ns, nr, nh = caps
        g = self.g
        return _fused_fast_decode(
            self.SW, g.seg, B, g.num_buf, g.plane_bytes,
            g.byte_reorder, g.bit_reorder, ns, nr, nh,
        )


class _PCPlan:
    """Fast-path plan for per-cell-table containers (reference profile).

    All per-cell table parsing (native C++ batch parser) happens once here;
    ``rate12`` is decided container-wide from the exact stream lengths, and
    VMEM eligibility is checked for the rate12 class too so the starvation
    retry can always compile (round-2 ADVICE)."""

    kind = "pc"

    @classmethod
    def build(cls, g: _Geom, force_rate12: bool = False):
        from . import pallas_huf_pc as pc  # noqa: PLC0415

        cls.BLOCK = pc.BLOCK
        if g.seg % 128:
            return None
        hb, hc = g.huf_cells
        if not hb.size:
            return None  # all-stored containers take the shared plan
        geo = _huf_stream_geometry(g)
        if geo is None:
            return None
        hcs, hsz, consumed, sstarts4, slens4 = geo
        max_len = int(slens4.max())
        rate12 = force_rate12 or (8.0 * max_len / g.seg > pc.RATE12_BITS)
        if not (pc.vmem_ok(max_len, g.seg, rate12)
                and pc.vmem_ok(max_len, g.seg, True)):
            return None
        import os  # noqa: PLC0415

        if not rate12 and os.environ.get("ZIPNN_TPU_RATE12") == "1":
            # operator knob: checkpoints with mixed text/weight chunks can
            # starve the base class on segment-local bit-rate spikes that
            # no stream-length statistic predicts; forcing the provisioned
            # class up front skips the retry decode entirely
            rate12 = True
        from ..stats import phase  # noqa: PLC0415

        try:
            with phase("decode:plan-tables"):
                bounds, pages, tlog_k = pc.cell_decode_tables_payload(
                    g.payload_np, hcs, consumed
                )
        except ValueError:
            return None
        p = cls()
        p.g = g
        p.n_huf_total = int(hb.size)
        p.sstarts4 = sstarts4
        p.slens4 = slens4
        p.bounds = bounds
        p.pages = pages
        p.tlog_k = tlog_k
        p.rate12 = rate12
        p.SW = pc.sw_for(max_len)
        p.RT = p.SW // 128
        return p

    def fused_call(self, caps, B: int, force12: bool = False):
        ns, nr, nh = caps
        g = self.g
        return _fused_pc_decode(
            self.SW, g.seg, B, g.num_buf, g.plane_bytes,
            g.byte_reorder, g.bit_reorder, ns, nr, nh,
            self.tlog_k, self.rate12 or force12,
        )


def _bucket_up(x: int, q: int) -> int:
    """Round x up to a multiple of q (0 stays 0)."""
    return -(-x // q) * q if x else 0


def _batch_caps(g: _Geom, B: int, n_batches: int):
    """Per-batch cell-count capacities (max over batches per class), so
    every batch shares one compiled kernel geometry.

    Caps are rounded up to multiples of 512 cells: shards of similar (not
    identical) cell mixes then hit the SAME compiled kernel — the serving
    path decodes checkpoint shards back to back, and per-file exact caps
    would recompile for every file.  Padding lanes get in-bounds geometry
    and decode garbage harmlessly (_batch_host), so the only cost is a
    few % of lanes.
    """

    def cap(cols):
        if cols.size == 0:
            return 0
        return _bucket_up(
            int(np.bincount(cols // B, minlength=n_batches).max()), 512
        )

    return (cap(g.stored_cells[1]), cap(g.rle_cells[1]), cap(g.huf_cells[1]))


def _batch_caps_range(g: _Geom, lo: int, hi: int):
    def cap(cols):
        return int(np.count_nonzero((cols >= lo) & (cols < hi)))

    return (cap(g.stored_cells[1]), cap(g.rle_cells[1]), cap(g.huf_cells[1]))


def _batch_host(plan, lo: int, hi: int, caps, B: int):
    """Host kernel inputs for chunks [lo, hi), padded to ``caps``/``B``.

    Pure numpy slicing of the plan's container-wide arrays.  Padding lanes
    get in-bounds geometry (row 0 / zero boundaries) and decode garbage
    harmlessly; ``perm`` never selects them and ``pend`` is validated for
    the first ``S_real`` lanes only.
    """
    g = plan.g
    ns_cap, nr_cap, nh_cap = caps
    st_b, st_c = g.stored_cells
    rl_b, rl_c = g.rle_cells
    hb, hc = g.huf_cells
    ssel = (st_c >= lo) & (st_c < hi)
    rsel = (rl_c >= lo) & (rl_c < hi)
    hsel = (hc >= lo) & (hc < hi)
    stb, stc = st_b[ssel], st_c[ssel]
    rlb, rlc = rl_b[rsel], rl_c[rsel]
    hbb, hcc = hb[hsel], hc[hsel]
    n_st, n_rl, n_hf = stb.size, rlb.size, hbb.size
    perm = np.zeros((B, g.num_buf), dtype=np.int32)
    perm[stc - lo, stb] = np.arange(n_st, dtype=np.int32)
    perm[rlc - lo, rlb] = ns_cap + np.arange(n_rl, dtype=np.int32)
    perm[hcc - lo, hbb] = ns_cap + nr_cap + np.arange(n_hf, dtype=np.int32)
    # stored rows: tile index + word/byte shift, int64 host math (payloads
    # beyond 2 GB stay exact; the device sees only small int32 indices)
    st_tiles = np.zeros(ns_cap, np.int32)
    st_wsh = np.zeros(ns_cap, np.int32)
    st_bsh = np.zeros(ns_cap, np.int32)
    if n_st:
        bs = g.cs[stb, stc] + 512 * plan.RT
        st_tiles[:n_st] = (bs >> 9).astype(np.int32)
        st_wsh[:n_st] = ((bs >> 2) & 127).astype(np.int32)
        st_bsh[:n_st] = ((bs & 3) << 3).astype(np.int32)
    rle_vals = np.zeros(nr_cap, np.uint8)
    if n_rl:
        rle_vals[:n_rl] = g.payload_np[g.cs[rlb, rlc].astype(np.int64)]
    S_pad = -(-max(nh_cap * 4, 1) // plan.BLOCK) * plan.BLOCK
    n_blocks = S_pad // plan.BLOCK
    row_starts = np.zeros(S_pad, dtype=np.int32)
    p0 = np.full(S_pad, 8 * (4 * plan.SW - 1), dtype=np.int32)
    meta = {"S_real": 4 * n_hf, "cells": (hbb, hcc), "lo": lo, "hi": hi}
    if n_hf:
        ss = plan.sstarts4[hsel].reshape(-1)
        sl = plan.slens4[hsel].reshape(-1)
        ends = ss + sl
        tile_start, end_in_row = pallas_huf.stream_row_geometry(ends, plan.SW)
        row_starts[: 4 * n_hf] = tile_start
        last = g.payload_np[ends - 1]
        msb = np.floor(np.log2(last.astype(np.int64))).astype(np.int64)
        p0[: 4 * n_hf] = (8 * (end_in_row - 1) + msb).astype(np.int32)
        meta["end_in_row"] = end_in_row
        meta["slens"] = sl
    host = {
        "perm": perm.reshape(-1),
        "st_tiles": st_tiles, "st_wsh": st_wsh, "st_bsh": st_bsh,
        "rle_vals": rle_vals,
        "row_starts": row_starts,
        "p0": p0.reshape(n_blocks, pallas_huf.SUBS, 128),
    }
    if plan.kind == "pc":
        tk = plan.tlog_k
        full_sel = n_hf == plan.pages.shape[0]  # batch covers every HUF cell
        if full_sel and 4 * n_hf == S_pad:
            cbnd = np.repeat(plan.bounds, 4, axis=0)
        else:
            cbnd = np.zeros((S_pad, tk - 1), dtype=np.int32)
            if n_hf:
                cbnd[: 4 * n_hf] = np.repeat(plan.bounds[hsel], 4, axis=0)
        host["cbnd"] = np.ascontiguousarray(
            cbnd.reshape(n_blocks, pallas_huf.SUBS, 128, tk - 1).transpose(0, 3, 1, 2)
        )
        if full_sel and n_hf == S_pad // 4:
            # single-batch whole-container case (the common serving load):
            # the plan's page table is already exactly the kernel input —
            # skip the 2^tlog_k-wide zero-fill + copy (6.3 MB at 768 MB)
            host["pages"] = plan.pages
        else:
            pages_pad = np.zeros((S_pad // 4, (1 << tk) // 4), dtype=np.uint32)
            if n_hf:
                pages_pad[:n_hf] = plan.pages[hsel]
            host["pages"] = pages_pad
    return host, meta


def _to_dev(plan, tiles, host):
    jnp = _jnp()
    a = jnp.asarray
    common = (tiles, a(host["row_starts"]), a(host["p0"]))
    tail = (
        a(host["st_tiles"]), a(host["st_wsh"]), a(host["st_bsh"]),
        a(host["rle_vals"]), a(host["perm"]),
    )
    if plan.kind == "pc":
        return common + (a(host["cbnd"]), a(host["pages"])) + tail
    tbl = (
        a(plan.tbl8) if plan.tbl8 is not None
        else jnp.zeros((pallas_huf.SUBS, 128), jnp.int32)
    )
    return common + (tbl,) + tail


def _check_pend(pend, meta, rate12_used: bool):
    """Deferred per-stream final-position validation for one batch.

    Starved lanes (base-class window provisioning lost to a local bit-rate
    spike) raise :class:`_PCStarved` carrying the affected cell positions;
    every non-starved lane is still validated exactly first, so a genuinely
    corrupt stream reports :class:`CorruptChunkError` deterministically
    regardless of starvation elsewhere in the batch.
    """
    S = meta["S_real"]
    if not S:
        return
    pend_np = np.asarray(pend)[:S].astype(np.int64)
    starved = np.nonzero(pend_np < -(1 << 29))[0]
    if starved.size and rate12_used:
        raise RuntimeError(
            "window starvation under rate12 provisioning (kernel bug)"
        )
    want_end = 8 * (np.asarray(meta["end_in_row"]) - np.asarray(meta["slens"]))
    ok = np.ones(S, dtype=bool)
    ok[starved] = False
    if not np.array_equal(pend_np[ok], want_end[ok]):
        bad = int(np.nonzero(ok & (pend_np != want_end))[0][0])
        raise CorruptChunkError(
            f"HUF stream not fully consumed: pos {int(pend_np[bad])} "
            f"!= {int(want_end[bad])}",
            plane=int(meta["cells"][0][bad // 4]),
            chunk=int(meta["cells"][1][bad // 4]),
            stream=bad % 4,
        )
    if starved.size:
        raise _PCStarved(np.unique(starved // 4))


def _host_decode_chunk(g: _Geom, c: int) -> np.ndarray:
    """Decode one full chunk entirely on the host (native HUF when built).

    The starvation patch path: a freak text-like chunk inside a weights
    container starves the base-rate kernel class on a segment-local
    bit-rate spike; re-decoding just that chunk at host speed (native
    engine, ~GB/s) is far cheaper than re-running the whole device batch
    under rate12 provisioning.
    """
    planes: List[np.ndarray] = []
    for b in range(g.num_buf):
        o = int(g.cs[b, c])
        szv = int(g.sz[b, c])
        blob = g.payload_np[o : o + szv]
        if g.types[b, c] == 0 or szv == g.plane_bytes:
            planes.append(blob)
        elif szv == 1:
            planes.append(np.full(g.plane_bytes, blob[0], np.uint8))
        else:
            try:
                try:
                    from .. import native  # noqa: PLC0415

                    plane = native.huf_decompress(bytes(blob), g.plane_bytes)
                except (ImportError, OSError):
                    plane = huf.decompress(bytes(blob), g.plane_bytes)
            except (ValueError, RuntimeError) as exc:
                raise CorruptChunkError(str(exc), plane=b, chunk=c) from exc
            planes.append(np.asarray(plane))
    outc = np.empty(g.chunk_size, np.uint8)
    byte_group.combine(
        planes, g.chunk_size, g.num_buf, g.byte_reorder, g.bit_reorder,
        out=outc,
    )
    return outc


def _starved_chunks(meta, cells: Optional[np.ndarray]):
    """Map batch-local starved HUF-cell positions to absolute chunk ids."""
    if cells is None or not cells.size:
        return None
    return np.unique(np.asarray(meta["cells"][1])[cells])


def _patch_eligible(n_chunks: int, batch_chunks: int) -> bool:
    """Patch host-side only when the native engine is built (the pure-Python
    HUF decoder would be slower than a device batch retry) and the affected
    set is a small fraction of the batch."""
    if n_chunks > max(1, batch_chunks // 8):
        return False
    try:
        from .. import native  # noqa: PLC0415

        native._load()
    except Exception:
        return False
    return True


def _max_batch_chunks(chunk_size: int) -> int:
    """Chunks per fused-decode device batch.

    One batch costs ~6x its plaintext bytes in device working buffers
    (stream blocks, d-indices, symbols, planes, output) on top of the
    one-time payload upload; bounding the batch lets arbitrarily large
    containers (a 16 GB Llama checkpoint is ~34 GB of working set
    unbatched) stream through a single chip.  ZIPNN_TPU_BATCH_MB
    overrides (default 512).
    """
    import os  # noqa: PLC0415

    budget = int(os.environ.get("ZIPNN_TPU_BATCH_MB", "512")) * (1 << 20)
    return max(1, budget // max(chunk_size, 1))


def _run_fast(plan, g: _Geom, out, to_device: bool, force12: bool = False):
    """Pipelined batched execution of a fast-path plan: start + finish."""
    return _start_fast(plan, g, out, to_device, force12=force12)()


def upload_tiles(plan, g: _Geom):
    """Upload a container's payload tiles (the big host->device move) —
    exposed so serving/bench callers can stage it separately."""
    return _tiles_call(plan.RT)(_jnp().asarray(g.payload_np))


def _plan_batches(plan, g: _Geom):
    """The (B, batches, caps) geometry shared by execution and staging."""
    B = min(_bucket_up(g.full, 256), _max_batch_chunks(g.chunk_size))
    batches = [(lo, min(lo + B, g.full)) for lo in range(0, g.full, B)]
    caps = _batch_caps(g, B, len(batches))
    return B, batches, caps


def stage_dev_batches(plan, g: _Geom, tiles):
    """Pre-upload every batch's small device inputs (pages/cbnd/perm/...).

    Returns (staged, upload_bytes): ``staged`` maps batch ``lo`` -> (host,
    meta, dev_args) for :func:`_start_fast`'s ``staged=`` parameter.  A
    serving prefetcher (or the bench, where the host->device link is a
    ~30 MB/s tunnel rather than PCIe) stages shard N+1's inputs while
    shard N decodes.
    """
    B, batches, caps = _plan_batches(plan, g)
    staged = {}
    nbytes = 0
    for lo, hi in batches:
        host, meta = _batch_host(plan, lo, hi, caps, B)
        dev = _to_dev(plan, tiles, host)
        nbytes += sum(v.nbytes for v in host.values())
        staged[lo] = (host, meta, dev)
    return staged, nbytes


# ---------------------------------------------------------------------------
# shard stacking: N equal-geometry containers in ONE fused dispatch
# ---------------------------------------------------------------------------

def _stack_key(plan, g: _Geom):
    return (
        plan.kind, plan.SW, g.seg, getattr(plan, "tlog_k", 0), plan.rate12,
        g.num_buf, g.chunk_size, g.byte_reorder, g.bit_reorder,
    )


class _Stacked:
    """N single-batch pc-plan shards fused into one dispatch's inputs.

    A checkpoint load decodes many similar shards; even fully staged and
    pipelined, each shard costs a dispatch round-trip — on a high-latency
    link (the axon tunnel pays ~30 ms per dispatch) that RPC floor, not
    the kernels, bounds the aggregate rate.  Stacking concatenates the
    shards' payload tiles on device and offset-remaps the per-shard host
    inputs (tile indices, the virtual [stored|rle|huf] permutation, pages
    groups) so the SAME fused kernel decodes all of them in one go.
    """

    __slots__ = (
        "plans", "gs", "dev", "caps", "B_tot", "n_huf_eff", "rate12",
        "B_offs", "S_offs", "metas", "upload_bytes",
    )


def build_stacked(items) -> Optional["_Stacked"]:
    """Stack staged shards (``(plan, g, tiles)`` triples) for one dispatch.

    Returns None when the shards are not stackable: fewer than two, any
    non-pc plan, multi-batch containers, unequal kernel geometry, or a
    plane count the mono-assembly kernel does not cover.
    """
    jnp = _jnp()
    if len(items) < 2:
        return None
    keys = set()
    per = []
    for plan, g, tiles in items:
        if plan.kind != "pc" or g.full == 0:
            return None
        if g.num_buf not in (1, 2) or (g.plane_bytes // 4) % 128:
            return None
        B, batches, caps = _plan_batches(plan, g)
        if len(batches) != 1:
            return None
        keys.add(_stack_key(plan, g))
        per.append((plan, g, tiles, B, caps))
    if len(keys) != 1:
        return None
    # HBM working-set gate: a stacked dispatch behaves like one batch of
    # B_tot chunks (~6x its plaintext bytes in device buffers on top of
    # every shard's payload tiles).  Past the per-dispatch batch budget
    # the giant dispatch thrashes the allocator — measured 2.2 GB/s for
    # 8 x 237 MB stacked (~14 GB working set on a 16 GB v5e) vs ~15 GB/s
    # for the same shards through pipelined per-shard dispatches — so
    # refuse and let the caller take decompress_all.
    if sum(B for *_x, B, _c in per) > _max_batch_chunks(
        items[0][1].chunk_size
    ):
        return None

    nb = items[0][1].num_buf
    NS = sum(c[0] for *_x, c in per)
    NR = sum(c[1] for *_x, c in per)
    perm_l, stt_l, wsh_l, bsh_l, rle_l = [], [], [], [], []
    rs_l, p0_l, cbnd_l, pg_l = [], [], [], []
    ns_prev = nr_prev = g_prev = 0
    tile_off = 0
    B_offs, S_offs, metas = [], [], []
    B_tot = 0
    upload = 0
    for plan, g, tiles, B, (ns_i, nr_i, nh_i) in per:
        host, meta = _batch_host(plan, 0, g.full, (ns_i, nr_i, nh_i), B)
        S_pad_i = host["row_starts"].size
        perm = host["perm"].astype(np.int64)
        k0 = perm < ns_i
        k1 = (perm >= ns_i) & (perm < ns_i + nr_i)
        k2 = ~k0 & ~k1
        newp = np.empty_like(perm)
        newp[k0] = perm[k0] + ns_prev
        newp[k1] = perm[k1] - ns_i + NS + nr_prev
        # huf sources address hsrc/pages GROUPS, which are per-shard padded
        # to S_pad/4 — offset by the padded group count, not the cell count
        newp[k2] = perm[k2] - (ns_i + nr_i) + NS + NR + g_prev
        perm_l.append(newp.astype(np.int32))
        stt_l.append(host["st_tiles"] + np.int32(tile_off))
        wsh_l.append(host["st_wsh"])
        bsh_l.append(host["st_bsh"])
        rle_l.append(host["rle_vals"])
        rs = host["row_starts"] + np.int32(tile_off)
        rs_l.append(rs)
        p0_l.append(host["p0"])
        cbnd_l.append(host["cbnd"])
        pages = host["pages"]
        G_i = S_pad_i // 4
        if pages.shape[0] != G_i:
            pad = np.zeros((G_i, pages.shape[1]), dtype=pages.dtype)
            pad[: pages.shape[0]] = pages
            pages = pad
        pg_l.append(pages)
        meta = dict(meta)
        meta["rate12"] = plan.rate12
        metas.append(meta)
        B_offs.append(B_tot)
        S_offs.append(sum(r.size for r in rs_l) - S_pad_i)
        B_tot += B
        ns_prev += ns_i
        nr_prev += nr_i
        g_prev += G_i
        tile_off += int(tiles.shape[0])
        upload += sum(v.nbytes for v in host.values())

    stk = _Stacked()
    stk.plans = [p for p, *_r in per]
    stk.gs = [g for _p, g, *_r in per]
    stk.caps = (NS, NR, g_prev)  # n_huf passed as padded group count
    stk.B_tot = B_tot
    stk.n_huf_eff = g_prev
    stk.rate12 = per[0][0].rate12
    stk.B_offs = B_offs
    stk.S_offs = S_offs
    stk.metas = metas
    a = jnp.asarray
    tiles_all = jnp.concatenate([it[2] for it in items])
    n_blocks = sum(p.shape[0] for p in p0_l)
    stk.dev = (
        tiles_all,
        a(np.concatenate(rs_l)),
        a(np.concatenate(p0_l).reshape(n_blocks, pallas_huf.SUBS, 128)),
        a(np.ascontiguousarray(np.concatenate(cbnd_l))),
        a(np.concatenate(pg_l)),
        a(np.concatenate(stt_l)),
        a(np.concatenate(wsh_l)),
        a(np.concatenate(bsh_l)),
        a(np.concatenate(rle_l)),
        a(np.concatenate(perm_l)),
    )
    stk.upload_bytes = upload
    return stk


@lru_cache(maxsize=None)
def _stacked_fin_call(offs_fulls: tuple, cw: int, tail_words: tuple):
    """One jitted finalize for a stacked bundle: per-shard row slice +
    flatten (+ ragged-tail append), cached by geometry — an inline
    ``jax.jit(closure)`` here would retrace AND recompile on every
    bundle (measured: grouping bundles ran SLOWER than per-shard
    dispatches until this was hoisted)."""
    import jax  # noqa: PLC0415

    jnp = _jnp()

    def fin(flat_, *tails_):
        res = []
        ti = 0
        for (boff, full), tw in zip(offs_fulls, tail_words):
            part = flat_[boff : boff + full].reshape(-1)
            if tw:
                part = jnp.concatenate([part, tails_[ti]])
                ti += 1
            res.append(part)
        return tuple(res)

    return jax.jit(fin)


def run_stacked(stk: "_Stacked", to_device: bool, defer=None,
                tail_devs=None):
    """Dispatch a :func:`build_stacked` bundle; returns per-shard outputs.

    ``defer``: like :func:`_start_fast` — appends one validation record
    per shard instead of validating inline AND skips this call's own
    stream-end fetch entirely, so consecutive bundles pipeline with no
    sync between them; the caller resolves every bundle's records in one
    :func:`fetch_pends`.

    Device-output RPC budget with ``defer``: zero round-trips here — the
    fused decode dispatch and the one jitted finalize call (slices the
    stacked output, appends every shard's host-decoded ragged tail) are
    both async; the caller pays one stacked fetch for the whole load.
    """
    plan0 = stk.plans[0]
    g0 = stk.gs[0]
    run = plan0.fused_call(stk.caps, stk.B_tot)
    flat, pend = run(*stk.dev)
    cs = g0.chunk_size
    outs: List = [None] * len(stk.gs)

    if to_device:
        # one finalize dispatch for every shard: slice + tail append
        # (per-shard jnp.concatenate calls would pay one RPC each).
        # Word domain throughout (see _finish_batched); tails zero-pad to
        # 512 B so every shard's word count stays % 128 == 0.
        # ragged tails: pre-staged device words when given (serving stages
        # them off the hot path), host-decoded + uploaded here otherwise
        tails = tail_devs if tail_devs is not None else [
            tail_words_host(g) for g in stk.gs
        ]
        fin = _stacked_fin_call(
            tuple((stk.B_offs[i], g.full) for i, g in enumerate(stk.gs)),
            cs // 4,
            tuple(0 if t is None else int(t.size) for t in tails),
        )
        parts = fin(flat, *[t for t in tails if t is not None])
        outs = [
            jax_transforms.DeviceWords(w, g.orig_size)
            for w, g in zip(parts, stk.gs)
        ]
    # stream-end vectors: deferred callers batch ONE fetch over every
    # bundle in flight; inline callers validate here
    pend_np = None if defer is not None else np.asarray(pend)
    for i, g in enumerate(stk.gs):
        S_off = stk.S_offs[i]
        meta = stk.metas[i]
        S_pad_i = (
            (stk.S_offs[i + 1] if i + 1 < len(stk.S_offs) else int(pend.size))
            - S_off
        )
        if defer is not None:
            defer.append(
                {
                    "pend": pend[S_off : S_off + S_pad_i],
                    "meta": meta, "plan": stk.plans[i], "g": g,
                    "lo": 0, "hi": g.full, "to_device": to_device,
                }
            )
        else:
            _check_pend(pend_np[S_off : S_off + S_pad_i], meta, meta["rate12"])
        if not to_device:
            out = np.empty(g.orig_size, dtype=np.uint8)
            host_np = np.asarray(
                flat[stk.B_offs[i] : stk.B_offs[i] + g.full]
            ).astype("<u4", copy=False)
            out[: g.full * cs] = host_np.reshape(-1).view(np.uint8)
            _finish_batched(
                None, out, g.mv, g.types, g.cell_start, g.cell_size,
                g.full, g.n_chunks, g.chunk_size, g.orig_size, g.num_buf,
                g.byte_reorder, g.bit_reorder, False,
            )
            outs[i] = out
    return outs


def tail_words_host(g: _Geom) -> Optional[np.ndarray]:
    """Decode the ragged tail chunk (if any) to 512 B-padded u32 words.

    Host work a stager runs OFF the hot path: a serving load's tail
    decode + its small device upload otherwise lands between batch
    dispatches and bubbles the pipeline (measured ~10 ms/shard on the
    tunnel rig).
    """
    if g.full >= g.n_chunks:
        return None
    nt = g.orig_size - g.full * g.chunk_size
    tail = np.zeros(-(-nt // 512) * 512, np.uint8)
    _finish_tail(
        tail[:nt], g.mv, g.types, g.cell_start, g.cell_size, g.full,
        g.n_chunks, g.chunk_size, g.orig_size, g.num_buf,
        g.byte_reorder, g.bit_reorder, tail_base=g.full * g.chunk_size,
    )
    return tail.view("<u4")


def _start_fast(
    plan, g: _Geom, out, to_device: bool, tiles=None,
    staged=None, defer=None, force12: bool = False, tail_dev=None,
):
    """Submit the first device batches of a fast-path plan; returns a
    ``finish()`` closure that drains (and submits the rest, depth-2).

    Submits batch N+1 (host slicing + small uploads + async dispatch)
    before draining batch N, so host planning overlaps device decode; the
    depth-2 window bounds device memory to two batches' working sets plus
    the payload tiles.  The start/finish split lets the serving path
    (io/serving.py) overlap container N+1's host plan with container N's
    device decode.  ``B`` is bucketed to multiples of 256 chunks so
    similar-sized shards share one compiled kernel geometry (padded
    chunks have no cells and their garbage rows are never copied out).

    ``staged``: pre-uploaded per-batch device inputs from
    :func:`stage_dev_batches`.  ``defer``: a list — when given, per-batch
    stream-end validation (a blocking device fetch) is SKIPPED and a
    record is appended instead; the caller must run
    :func:`validate_deferred` before trusting any output (see
    io/serving.py, which batches many shards' validations into one
    device fetch).
    """
    jnp = _jnp()
    B, batches, caps = _plan_batches(plan, g)
    if tiles is None:
        tiles = upload_tiles(plan, g)
    flats: Optional[List] = [] if to_device else None

    sticky12 = [force12]  # a starved batch flips the rest of the container

    def submit(lo, hi, force12=False):
        force12 = force12 or sticky12[0]
        if staged is not None and lo in staged:
            host, meta, dev = staged[lo]
            meta = dict(meta)
        else:
            host, meta = _batch_host(plan, lo, hi, caps, B)
            dev = _to_dev(plan, tiles, host)
        run = plan.fused_call(caps, B, force12)
        owords, pend = run(*dev)
        meta["rate12"] = getattr(plan, "rate12", False) or force12
        return lo, hi, owords, pend, meta

    def drain(item):
        lo, hi, owords, pend, meta = item
        if defer is not None:
            defer.append(
                {"pend": pend, "meta": meta, "plan": plan, "g": g,
                 "lo": lo, "hi": hi, "to_device": to_device}
            )
            _append_output(item, None)
            return
        patches = None
        try:
            _check_pend(pend, meta, meta["rate12"])
        except _PCStarved as st:
            # freak local bit-rate spike under base provisioning.  When the
            # spike is confined to a few chunks (mixed json+weights content
            # in an otherwise dense checkpoint), re-decode just those
            # chunks host-side and patch the batch output.  Otherwise redo
            # the batch with the rate12 kernel class (same args, larger
            # windows) and keep the class for the container's remaining
            # batches — widespread mixed content repeats (a multi-batch
            # checkpoint then pays the double decode once, not per batch).
            chunks = _starved_chunks(meta, st.cells)
            if chunks is None or not _patch_eligible(chunks.size, hi - lo):
                sticky12[0] = True
                drain(submit(lo, hi, force12=True))
                return
            patches = {int(c): _host_decode_chunk(g, int(c)) for c in chunks}
        _append_output(item, patches)

    def _append_output(item, patches):
        lo, hi, owords, pend, meta = item
        if to_device:
            # keep the 32-bit word domain: u32 row slices/sets and the
            # final concat+flatten run at HBM rate, while any u8-typed
            # relayout costs ~4 GB/s (jax_transforms width-conversion
            # rules; the round-4 in-dispatch u8 output DOUBLED the
            # decode wall)
            rows = owords[: hi - lo]  # [n_chunks_batch, chunk_words] u32
            if patches:
                jnp_ = _jnp()
                for c, buf in patches.items():
                    rows = rows.at[c - lo].set(jnp_.asarray(buf.view("<u4")))
            flats.append(rows)
        else:
            host_np = np.asarray(owords[: hi - lo]).astype("<u4", copy=False)
            out[lo * g.chunk_size : hi * g.chunk_size] = (
                host_np.reshape(-1).view(np.uint8)
            )
            if patches:
                cs = g.chunk_size
                for c, buf in patches.items():
                    out[c * cs : (c + 1) * cs] = buf

    inflight: List = []
    submitted = 0
    for lo, hi in batches[: 2]:
        inflight.append(submit(lo, hi))
        submitted += 1

    def finish():
        nonlocal submitted
        for lo, hi in batches[submitted:]:
            drain(inflight.pop(0))
            inflight.append(submit(lo, hi))
            submitted += 1
        while inflight:
            drain(inflight.pop(0))
        return _finish_batched(
            flats, out, g.mv, g.types, g.cell_start, g.cell_size, g.full,
            g.n_chunks, g.chunk_size, g.orig_size, g.num_buf,
            g.byte_reorder, g.bit_reorder, to_device, tail_dev=tail_dev,
        )

    return finish


def fetch_pends(entries, drain=None) -> None:
    """Fetch ALL deferred validation vectors in ONE device round-trip.

    ``entries`` are the records :func:`_start_fast` appended under
    ``defer=``; each gains a ``pend_np`` host array.  Batching the fetch
    matters on links where a device round-trip has high fixed latency:
    per-shard validation syncs put an RPC floor under a multi-shard load,
    one stacked fetch amortizes it across every shard in flight.

    ``drain``: an optional device array whose first element is folded into
    the same fetch — pass the output words to also wait for the full
    pipeline without a second round-trip (the pends come from the same
    dispatches, so they normally imply completion anyway; ``drain`` covers
    callers that appended further device work after the last batch).
    """
    entries = [e for e in entries if "pend_np" not in e]
    jnp = _jnp()
    parts = [e["pend"].reshape(-1) for e in entries]
    if drain is not None:
        parts.append(drain.reshape(-1)[:1].astype(jnp.int32))
    if not parts:
        return
    flat = np.asarray(parts[0] if len(parts) == 1 else jnp.concatenate(parts))
    off = 0
    for e in entries:
        n = e["pend"].size
        e["pend_np"] = flat[off : off + n]
        off += n


def check_deferred_entry(e) -> Optional[dict]:
    """Validate one deferred batch record (after :func:`fetch_pends`).

    Returns None when the batch is clean, or ``{chunk: patched_bytes}``
    when a few starved chunks were re-decoded host-side.  Raises
    CorruptChunkError for genuine corruption and :class:`_PCStarved` when
    starvation is too widespread to patch (the caller re-runs the
    container under rate12 provisioning).
    """
    try:
        _check_pend(e["pend_np"], e["meta"], e["meta"]["rate12"])
    except _PCStarved as st:
        g = e["g"]
        chunks = _starved_chunks(e["meta"], st.cells)
        if chunks is None or not _patch_eligible(chunks.size, e["hi"] - e["lo"]):
            raise
        return {int(c): _host_decode_chunk(g, int(c)) for c in chunks}
    return None


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------

def decompress_payload(
    payload,
    num_buf: int,
    bit_reorder: int,
    byte_reorder: int,
    chunk_size: int,
    orig_size: int,
    to_device: bool = False,
) -> np.ndarray:
    """Decompress the table+planes payload to flat bytes (device pipeline).

    Shared-table and per-cell-table containers with full chunks take the
    fused Pallas fast paths (see module docstring); anything else takes
    the XLA lockstep decoder.  ``to_device=True`` returns a device-resident
    :class:`jax_transforms.DeviceWords` (uint32 word stream + byte length —
    the serving shape: checkpoint bytes decompress straight into HBM;
    retype with :func:`jax_transforms.words_to_typed` or fetch with
    ``.to_numpy()``).
    """
    out = np.empty(orig_size, dtype=np.uint8)
    g = _parse_geometry(
        payload, num_buf, chunk_size, orig_size, bit_reorder, byte_reorder
    )
    if g is None:
        return _upload_words(out) if to_device else out
    if g.full and _platform_is_tpu():
        plan = _SharedPlan.build(g)
        if plan is None:
            plan = _PCPlan.build(g)
        if plan is not None:
            return _run_fast(plan, g, out, to_device)
    return _decode_generic(g, out, to_device)


def plan_fast_decode(
    payload,
    num_buf: int,
    bit_reorder: int,
    byte_reorder: int,
    chunk_size: int,
    orig_size: int,
):
    """Build the fused device decode for a shared-table container.

    Returns (run, dev_args, meta) where ``run(*dev_args)`` is the
    single-dispatch HBM->HBM decompress of all full chunks (meta carries
    the validation vectors), or None when the container is not fast-path
    eligible.  Used by the benchmark harness and the device-resident
    serving path.
    """
    try:
        g = _parse_geometry(
            payload, num_buf, chunk_size, orig_size, bit_reorder, byte_reorder
        )
    except ValueError:
        return None
    if g is None or not g.full or not _platform_is_tpu():
        return None
    plan = _SharedPlan.build(g)
    if plan is None:
        return None
    return _single_range_plan(plan, g, 0, g.full)


def plan_pc_decode(
    payload,
    num_buf: int,
    bit_reorder: int,
    byte_reorder: int,
    chunk_size: int,
    orig_size: int,
    force_rate12: bool = False,
    chunk_range=None,
    min_sw: int = 0,
):
    """Build the fused per-cell-table device decode (reference containers).

    Returns (run, dev_args, meta) like :func:`plan_fast_decode`, or None
    when not eligible (needs a TPU, tableLog <= 12, stream geometry within
    the kernel's VMEM budget).  ``chunk_range=(lo, hi)`` restricts the
    device args to that range of full chunks; ``min_sw`` floors the
    stream-row width.
    """
    try:
        g = _parse_geometry(
            payload, num_buf, chunk_size, orig_size, bit_reorder, byte_reorder
        )
    except ValueError:
        return None
    if g is None or not g.full or not _platform_is_tpu():
        return None
    plan = _PCPlan.build(g, force_rate12=force_rate12)
    if plan is None:
        return None
    if min_sw and min_sw > plan.SW:
        plan.SW = -(-min_sw // 256) * 256
        plan.RT = plan.SW // 128
    lo, hi = (0, g.full) if chunk_range is None else chunk_range
    return _single_range_plan(plan, g, lo, hi)


def _single_range_plan(plan, g: _Geom, lo: int, hi: int):
    jnp = _jnp()
    B = hi - lo
    caps = _batch_caps_range(g, lo, hi)
    host, meta = _batch_host(plan, lo, hi, caps, B)
    tiles = _tiles_call(plan.RT)(jnp.asarray(g.payload_np))
    dev_args = _to_dev(plan, tiles, host)
    run = plan.fused_call(caps, B)
    meta_out = {
        "SW": plan.SW, "slens": meta.get("slens"), "full": B,
        "n_huf": caps[2], "end_in_row": meta.get("end_in_row"),
        "cells": meta["cells"], "batch_meta": meta,
    }
    if plan.kind == "pc":
        meta_out["tlog_k"] = plan.tlog_k
        meta_out["rate12"] = plan.rate12
    return run, dev_args, meta_out


# ---------------------------------------------------------------------------
# generic path (host scatter + XLA lockstep decode) and the ragged tail
# ---------------------------------------------------------------------------

def _decode_generic(g: _Geom, out, to_device: bool):
    jnp = _jnp()
    from .jax_codec import _DTABLE_PAD, _decode, _round_words  # noqa: PLC0415

    full = g.full
    if full:
        plane_bytes = g.plane_bytes
        seg = plane_bytes // 4
        raw_planes = np.empty((full, g.num_buf, plane_bytes), dtype=np.uint8)
        for b, c in zip(*g.stored_cells):
            o = int(g.cs[b, c])
            raw_planes[c, b] = g.payload_np[o : o + plane_bytes]
        for b, c in zip(*g.rle_cells):
            raw_planes[c, b] = g.payload_np[int(g.cs[b, c])]

        huf_b, huf_c = g.huf_cells
        n_huf = huf_b.size
        huf_planes = None
        if n_huf:
            hcs = g.cs[huf_b, huf_c].astype(np.int64)
            hsz = g.sz[huf_b, huf_c].astype(np.int64)
            # per-cell tables, XLA lockstep decode
            dtables: List[np.ndarray] = []
            stream_blobs: List[bytes] = []
            stream_bits: List[int] = []
            stream_tlog: List[int] = []
            for i in range(n_huf):
                o = int(hcs[i])
                data = bytes(g.payload_np[o : o + int(hsz[i])])
                try:
                    weights, rank_stats, tlog, _, consumed = huf.read_stats(
                        data
                    )
                    sym_t, nb_t = huf.build_dtable(weights, rank_stats, tlog)
                    rest = data[consumed:]
                    if len(rest) < 6:
                        raise ValueError(
                            "corrupt HUF block (missing jump table)"
                        )
                    l1 = int.from_bytes(rest[0:2], "little")
                    l2 = int.from_bytes(rest[2:4], "little")
                    l3 = int.from_bytes(rest[4:6], "little")
                    l4 = len(rest) - 6 - l1 - l2 - l3
                    if l4 <= 0:
                        raise ValueError(
                            "corrupt HUF block (jump table overruns input)"
                        )
                    cell_streams = []
                    off = 6
                    for ln in (l1, l2, l3, l4):
                        s = rest[off : off + ln]
                        if not s:
                            raise ValueError(
                                "corrupt HUF block (empty stream)"
                            )
                        cell_streams.append(
                            (s, jax_entropy.sentinel_bits(s), tlog)
                        )
                        off += ln
                except ValueError as exc:
                    # every engine reports structural corruption as
                    # CorruptChunkError with (plane, chunk) context
                    raise CorruptChunkError(
                        str(exc), plane=int(huf_b[i]), chunk=int(huf_c[i])
                    ) from exc
                ent = np.zeros(_DTABLE_PAD, dtype=np.int32)
                ent[: sym_t.size] = sym_t.astype(np.int32) | (
                    nb_t.astype(np.int32) << 8
                )
                for s, sb, tl in cell_streams:
                    stream_blobs.append(s)
                    stream_bits.append(sb)
                    stream_tlog.append(tl)
                dtables.append(ent)
            wpr = _round_words(max(len(s) for s in stream_blobs))
            words = jax_entropy.pack_streams_np(stream_blobs, wpr)
            tbl_off = np.repeat(np.arange(n_huf, dtype=np.int32) * _DTABLE_PAD, 4)
            syms, bits_left = _decode(
                jnp.asarray(words),
                jnp.asarray(np.asarray(stream_bits, dtype=np.int32)),
                jnp.asarray(np.asarray(stream_tlog, dtype=np.int32)),
                jnp.asarray(tbl_off),
                jnp.asarray(np.concatenate(dtables)),
                seg,
                wpr,
            )
            bl = np.asarray(bits_left)
            if np.any(bl != 0):
                bad = int(np.nonzero(bl != 0)[0][0])
                raise CorruptChunkError(
                    f"HUF stream not fully consumed ({int(bl[bad])} bits left)",
                    plane=int(huf_b[bad // 4]), chunk=int(huf_c[bad // 4]),
                    stream=bad % 4,
                )
            huf_planes = syms.reshape(n_huf, plane_bytes)

        # ---- scatter decoded planes, combine, one device->host copy ------
        planes_dev = jnp.asarray(raw_planes)
        if n_huf:
            idx_c = jnp.asarray(huf_c.astype(np.int32))
            idx_b = jnp.asarray(huf_b.astype(np.int32))
            planes_dev = planes_dev.at[idx_c, idx_b].set(huf_planes)

        from .jax_codec import _combine  # noqa: PLC0415

        pw = planes_dev.reshape(full, g.num_buf, plane_bytes // 4, 4).astype(jnp.uint32)
        pwords = pw[..., 0] | (pw[..., 1] << 8) | (pw[..., 2] << 16) | (pw[..., 3] << 24)
        owords = _combine(pwords, g.num_buf, g.byte_reorder, g.bit_reorder)
        host = np.asarray(owords).astype("<u4", copy=False)
        out[: full * g.chunk_size] = host.reshape(-1).view(np.uint8)

    out = _finish_tail(
        out, g.mv, g.types, g.cell_start, g.cell_size, full, g.n_chunks,
        g.chunk_size, g.orig_size, g.num_buf, g.byte_reorder, g.bit_reorder,
    )
    if to_device:
        return _upload_words(out)
    return out


def _upload_words(out: np.ndarray) -> "jax_transforms.DeviceWords":
    """Host u8 buffer -> DeviceWords (512 B zero-pad, one upload)."""
    pad = (-out.size) % 512
    if pad:
        buf = np.zeros(out.size + pad, np.uint8)
        buf[: out.size] = out
    else:
        buf = out
    return jax_transforms.DeviceWords(
        _jnp().asarray(buf.view("<u4")), out.size
    )


def _finish_batched(
    flats, out, mv, types, cell_start, cell_size, full, n_chunks,
    chunk_size, orig_size, num_buf, byte_reorder, bit_reorder, to_device,
    tail_dev=None,
):
    """Marshal the batched fused decode's result (+ ragged tail).

    Device output is a :class:`jax_transforms.DeviceWords` — the uint32
    word stream (little-endian bytes) plus the logical byte length.  The
    concat+flatten stays in the 32-bit domain (HBM-rate relayout); the
    ragged tail is zero-padded to a word boundary, which
    :func:`jax_transforms.words_to_typed` relies on for its hazard scan.
    """
    jnp = _jnp()
    if to_device:
        words = [r.reshape(-1) for r in flats]
        if full < n_chunks:
            if tail_dev is None:
                # pad to 512 B so the total word count stays % 128 == 0
                # (chunk_size is a power of two >= 512, so full chunks
                # are) — words_to_typed's hazard scan wants 128-word rows
                tail = np.zeros(
                    -(-(orig_size - full * chunk_size) // 512) * 512, np.uint8
                )
                _finish_tail(
                    tail[: orig_size - full * chunk_size], mv, types,
                    cell_start, cell_size, full, n_chunks, chunk_size,
                    orig_size, num_buf, byte_reorder, bit_reorder,
                    tail_base=full * chunk_size,
                )
                tail_dev = jnp.asarray(tail.view("<u4"))
            words.append(tail_dev)
        flat = words[0] if len(words) == 1 else jnp.concatenate(words)
        return jax_transforms.DeviceWords(flat, orig_size)
    return _finish_tail(
        out, mv, types, cell_start, cell_size, full, n_chunks,
        chunk_size, orig_size, num_buf, byte_reorder, bit_reorder,
    )


def _finish_tail(
    out, mv, types, cell_start, cell_size, full, n_chunks,
    chunk_size, orig_size, num_buf, byte_reorder, bit_reorder,
    tail_base: int = 0,
):
    """Decode the (at most one) ragged tail chunk via the numpy golden model.

    With ``tail_base`` set, ``out`` holds only the tail (device-output path)
    and offsets are rebased accordingly.
    """
    if full < n_chunks:
        c = n_chunks - 1
        chunk_len = orig_size - c * chunk_size
        lens = byte_group.plane_lengths(chunk_len, num_buf, byte_reorder)
        planes = []
        for b in range(num_buf):
            lo = int(cell_start[b, c])
            hi = lo + int(cell_size[b, c])
            blob = mv[lo:hi]
            want = int(lens[b])
            if types[b, c] == 0:
                if hi - lo != want:
                    raise CorruptChunkError(
                        f"raw size mismatch: {hi - lo} != {want}", plane=b, chunk=c
                    )
                planes.append(np.frombuffer(blob, dtype=np.uint8))
            else:
                try:
                    try:
                        from .. import native  # noqa: PLC0415

                        planes.append(
                            np.asarray(native.huf_decompress(bytes(blob), want))
                        )
                    except (ImportError, OSError):
                        # pure-python fallback costs ~60 ms per 256 KB tail
                        # chunk — enough to dominate a multi-shard load
                        planes.append(huf.decompress(blob, want))
                except (ValueError, RuntimeError) as exc:
                    raise CorruptChunkError(str(exc), plane=b, chunk=c) from exc
        o0 = c * chunk_size - tail_base
        byte_group.combine(
            planes, chunk_len, num_buf, byte_reorder, bit_reorder,
            out=out[o0 : o0 + chunk_len],
        )
    return out
