"""Pallas fast-path decoder: schedule simulator + (TPU-only) kernel tests.

The numpy simulator mirrors the kernel's lockstep schedule — container,
window hierarchy, synchronized slides — exactly, so the sliding-window
invariants and bit arithmetic are validated on CPU; the compiled kernel
itself is exercised when a real TPU is present (see test_tpu_kernel).
"""
import numpy as np
import pytest

from zipnn_tpu.ops import pallas_huf
from zipnn_tpu.ops.entropy import huf

RNG = np.random.default_rng(11)


# ---------------------------------------------------------------------------
# golden inputs: K streams sharing one <=8-bit table
# ---------------------------------------------------------------------------

def make_shared_streams(n_streams, seg, skew=True):
    """Returns (datas [n, seg], region bytes, starts, lens, tbl8)."""
    if skew:
        # skewed byte distribution (exponent-plane-like)
        raw = np.clip(RNG.normal(128, 6, size=(n_streams, seg)), 0, 255)
        datas = raw.astype(np.uint8)
    else:
        datas = RNG.integers(0, 64, size=(n_streams, seg), dtype=np.uint8)

    count = np.bincount(datas.reshape(-1), minlength=256).astype(np.int64)
    lengths = huf.build_code_lengths(count, pallas_huf.TMAX)
    assert lengths is not None
    table_log = int(lengths.max())
    vals = huf.canonical_values(lengths, table_log)

    # decode table from the same weights convention as the wire format
    weights = [
        (table_log + 1 - int(lengths[s])) if lengths[s] else 0 for s in range(256)
    ]
    rank_stats = [0] * (huf.HUF_TABLELOG_MAX + 1)
    for w in weights:
        rank_stats[w] += 1
    sym_t, nb_t = huf.build_dtable(weights, rank_stats, table_log)
    tbl8 = pallas_huf.expand_dtable8(sym_t, nb_t, table_log)

    blobs = [huf.encode_stream(d, vals, lengths) for d in datas]
    region = b"".join(blobs)
    lens = np.asarray([len(b) for b in blobs], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return datas, np.frombuffer(region, dtype=np.uint8), starts, lens, tbl8


# ---------------------------------------------------------------------------
# numpy simulator of the kernel schedule (vectorized over streams)
# ---------------------------------------------------------------------------

def sim_decode(region, starts, lens, tbl8, seg):
    S = starts.size
    SW = 128 * pallas_huf.row_tiles_for(int(lens.max()))
    RT = SW // 128
    ends = (starts + lens).astype(np.int64)
    # tile-aligned rows out of the front-padded payload (exactly what the
    # pallas gather produces; bytes around each stream are real neighbors)
    reg = np.concatenate([np.zeros(512 * RT, np.uint8), region, np.zeros(512 * RT, np.uint8)])
    tile_start, end_in_row = pallas_huf.stream_row_geometry(ends, SW)
    rows = np.zeros((S, 4 * SW), np.uint8)
    for i in range(S):
        rs = 512 * int(tile_start[i])
        rows[i] = reg[rs : rs + 4 * SW]
    words = rows.view("<u4")  # [S, SW]

    last = region[ends - 1]
    p0 = 8 * (end_in_row - 1) + np.floor(np.log2(last)).astype(np.int64)

    tblw = np.asarray(tbl8[0]).astype(np.uint32)  # [128] packed

    U = np.uint32
    wtop = (p0 - 1) >> 5
    base2 = ((wtop >> 2) << 2) - 4
    base3 = ((base2 - 36) >> 5) << 5
    idx = np.arange(S)
    w3 = np.zeros((96, S), U)
    for m in range(96):
        w3[m] = words[idx, np.minimum(base3 + m, SW - 1)]
    w8 = [words[idx, np.minimum(base2 + k, SW - 1)].copy() for k in range(8)]
    w_a = words[idx, wtop]
    w_b = words[idx, wtop - 1]
    s0 = (32 * (wtop + 1) - p0).astype(np.uint32)
    hi = ((w_a << s0) | np.where(s0 == 0, U(0), w_b >> (np.uint32(32) - s0))).astype(U)
    lo = (w_b << s0).astype(U)
    navail = 64 - s0.astype(np.int64)
    p = p0.copy()
    wpos = wtop - 2

    out = np.zeros((S, seg), np.uint8)
    assert seg % 128 == 0
    step = 0
    for outer in range(seg // 128):
        slide3 = (base2 - base3) < 36
        nbase3 = np.where(slide3, base3 - 32, base3)
        c3 = np.maximum(nbase3, 0) >> 5
        for m in range(95, 31, -1):
            w3[m] = np.where(slide3, w3[m - 32], w3[m])
        for m in range(31, -1, -1):
            src = np.minimum(c3 * 32 + m, SW - 1)
            fetched = words[np.arange(S), src]
            w3[m] = np.where(slide3, fetched, w3[m])
        base3 = nbase3

        for sub in range(16):
            slide2 = (wpos - base2) < 4
            nbase2 = np.where(slide2, base2 - 4, base2)
            q2 = np.maximum(nbase2 - base3, 0) >> 2
            assert np.all((q2 < 16) | ~slide2), "w3 window invariant"
            for k in range(7, 3, -1):
                w8[k] = np.where(slide2, w8[k - 4], w8[k])
            for k in range(3, -1, -1):
                idx = np.minimum(4 * q2 + k, 63)
                fetched = w3[idx, np.arange(S)]
                w8[k] = np.where(slide2, fetched, w8[k])
            base2 = nbase2

            for local in range(8):
                peek = (hi >> U(24)).astype(np.int64)
                g = tblw[peek >> 1]
                ent = np.where(peek & 1, g >> U(16), g) & U(0xFFFF)
                nb = (ent >> U(8)).astype(np.int64)
                sym = (ent & U(0xFF)).astype(np.uint8)
                assert np.all((nb >= 1) & (nb <= 8))
                hi = ((hi << nb.astype(U)) | (lo >> (32 - nb).astype(U))).astype(U)
                lo = (lo << nb.astype(U)).astype(U)
                navail = navail - nb
                p = p - nb

                assert np.all(navail >= 8), "container underflow"
                if local % 2 == 1:
                    need = navail <= 32
                    kk = wpos - base2
                    assert np.all((kk >= 0) & (kk < 8) | ~need), "w8 window invariant"
                    w = w8[0].copy()
                    for k in range(1, 8):
                        w = np.where(kk == k, w8[k], w)
                    w_hi = np.where(navail < 32, w >> np.minimum(navail, 31).astype(U), U(0))
                    w_lo = (w << (32 - navail).astype(U)).astype(U)
                    hi = np.where(need, hi | w_hi, hi).astype(U)
                    lo = np.where(need, lo | w_lo, lo).astype(U)
                    navail = np.where(need, navail + 32, navail)
                    wpos = np.where(need, wpos - 1, wpos)

                out[:, step] = sym
                step += 1
    return out, p


def test_sim_matches_scalar_decoder():
    seg = 512
    datas, region, starts, lens, tbl8 = make_shared_streams(9, seg)
    out, pend = sim_decode(region, starts, lens, tbl8, seg)
    assert np.array_equal(out, datas)
    SW = 128 * pallas_huf.row_tiles_for(int(lens.max()))
    _, end_in_row = pallas_huf.stream_row_geometry((starts + lens).astype(np.int64), SW)
    assert np.array_equal(pend, 8 * (end_in_row - lens))


def test_sim_uniform_data_rle_like():
    # very low entropy -> long codes absent, high rate variance across lanes
    seg = 256
    datas = np.concatenate(
        [
            RNG.integers(0, 4, size=(4, seg), dtype=np.uint8),  # ~2 bits/sym
            np.clip(RNG.normal(100, 40, size=(4, seg)), 0, 255).astype(np.uint8),
        ]
    )
    count = np.bincount(datas.reshape(-1), minlength=256).astype(np.int64)
    lengths = huf.build_code_lengths(count, 8)
    table_log = int(lengths.max())
    vals = huf.canonical_values(lengths, table_log)
    weights = [(table_log + 1 - int(l)) if l else 0 for l in lengths]
    rank_stats = [0] * 13
    for w in weights:
        rank_stats[w] += 1
    sym_t, nb_t = huf.build_dtable(weights, rank_stats, table_log)
    tbl8 = pallas_huf.expand_dtable8(sym_t, nb_t, table_log)
    blobs = [huf.encode_stream(d, vals, lengths) for d in datas]
    region = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    lens = np.asarray([len(b) for b in blobs])
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    out, _ = sim_decode(region, starts, lens, tbl8, seg)
    assert np.array_equal(out, datas)


def test_expand_dtable8_small_log():
    # table_log 3: every 8-bit peek must resolve via top-3-bit expansion
    data = np.asarray([0, 0, 0, 0, 1, 1, 2, 3] * 64, dtype=np.uint8)
    count = np.bincount(data, minlength=256).astype(np.int64)
    lengths = huf.build_code_lengths(count, 8)
    table_log = int(lengths.max())
    vals = huf.canonical_values(lengths, table_log)
    weights = [(table_log + 1 - int(l)) if l else 0 for l in lengths]
    rank_stats = [0] * 13
    for w in weights:
        rank_stats[w] += 1
    sym_t, nb_t = huf.build_dtable(weights, rank_stats, table_log)
    tbl8 = pallas_huf.expand_dtable8(sym_t, nb_t, table_log)
    blob = huf.encode_stream(data, vals, lengths)
    region = np.frombuffer(blob, dtype=np.uint8)
    out, _ = sim_decode(
        region, np.asarray([0]), np.asarray([len(blob)]), tbl8, data.size
    )
    assert np.array_equal(out[0], data)


@pytest.mark.tpu
def test_tpu_kernel_matches_golden():
    import jax

    if jax.devices()[0].platform not in ("tpu",):
        pytest.skip("needs a real TPU")
    seg = 512
    datas, region, starts, lens, tbl8 = make_shared_streams(2050, seg)
    out = pallas_huf.decode_shared_table(region, starts, lens, tbl8, seg)
    assert np.array_equal(np.asarray(out), datas)


@pytest.mark.tpu
def test_tpu_fused_decode_full_byte():
    """The one-dispatch fused pipeline (gather + align + kernel + combine)
    reproduces every byte of a 16MB shared-profile container, including
    the raw-stored mantissa plane."""
    import jax

    if jax.devices()[0].platform not in ("tpu",):
        pytest.skip("needs a real TPU")
    from zipnn_tpu import ZipNN
    from zipnn_tpu.core.header import HEADER_LEN
    from zipnn_tpu.ops import jax_codec

    rng = np.random.default_rng(7)
    n = 16 * 1024 * 1024
    vals = (rng.standard_normal(n // 2) * 0.05).astype(np.float32)
    data = ((vals.view(np.uint32) >> 16).astype(np.uint16)).tobytes()[:n]
    comp = ZipNN(
        engine="numpy", huffman_table="shared", compression_chunk=32768
    ).compress(data)
    payload = np.frombuffer(comp, np.uint8)[HEADER_LEN:]
    plan = jax_codec.plan_fast_decode(payload, 2, 1, 10, 32768, len(data))
    assert plan is not None
    run, dev_args, _meta = plan
    owords, _pend = run(*dev_args)
    got = np.ascontiguousarray(owords).astype("<u4").view(np.uint8)
    assert bytes(got.reshape(-1)[: len(data)]) == data
