"""Pallas kernels under the interpreter: the exact kernel logic on CPU.

The @pytest.mark.tpu suites in test_pallas_huf.py / test_pallas_huf_enc.py
run the *compiled* kernels on real hardware; these tests run the same
kernel bodies through ``pl.pallas_call(..., interpret=True)`` on tiny
shapes.

Marked ``interpret`` and excluded from the default run (pytest.ini): XLA
CPU takes 10+ minutes to compile each unrolled kernel body (measured; the
select-scan window slides blow up its scheduling passes), with or without
``jax.disable_jit``.  The default-suite CPU coverage of the kernel logic
is therefore the op-for-op numpy schedule simulators (test_pallas_huf.py,
test_pallas_huf_pc.py) plus the mocked-kernel host-path tests in
test_jax_engine.py; run these interpreter tests explicitly with
``pytest -m interpret`` when touching kernel code.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.interpret

from zipnn_tpu.ops import jax_codec, pallas_gather, pallas_huf, pallas_huf_enc
from zipnn_tpu.ops.entropy import huf

RNG = np.random.default_rng(23)


@pytest.fixture()
def interpret_kernels(monkeypatch):
    monkeypatch.setattr(pallas_huf, "INTERPRET", True)
    monkeypatch.setattr(pallas_huf_enc, "INTERPRET", True)
    monkeypatch.setattr(pallas_gather, "INTERPRET", True)
    monkeypatch.setattr(jax_codec, "FORCE_DEVICE_PATH", True)
    yield


def _table_from(datas):
    count = np.bincount(datas.reshape(-1), minlength=256).astype(np.int64)
    lengths = huf.build_code_lengths(count, pallas_huf.TMAX)
    assert lengths is not None
    table_log = int(lengths.max())
    vals = huf.canonical_values(lengths, table_log)
    weights = [
        (table_log + 1 - int(lengths[s])) if lengths[s] else 0 for s in range(256)
    ]
    rank_stats = [0] * (huf.HUF_TABLELOG_MAX + 1)
    for w in weights:
        rank_stats[w] += 1
    sym_t, nb_t = huf.build_dtable(weights, rank_stats, table_log)
    return lengths, vals, table_log, sym_t, nb_t


def test_decode_kernel_interpret(interpret_kernels):
    seg = 128
    datas = np.clip(RNG.normal(128, 6, size=(5, seg)), 0, 255).astype(np.uint8)
    lengths, vals, table_log, sym_t, nb_t = _table_from(datas)
    tbl8 = pallas_huf.expand_dtable8(sym_t, nb_t, table_log)
    blobs = [huf.encode_stream(d, vals, lengths) for d in datas]
    region = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    lens = np.asarray([len(b) for b in blobs], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    out = pallas_huf.decode_shared_table(region, starts, lens, tbl8, seg)
    assert np.array_equal(np.asarray(out), datas)


def test_decode_kernel_interpret_detects_corruption(interpret_kernels):
    seg = 128
    datas = np.clip(RNG.normal(128, 5, size=(3, seg)), 0, 255).astype(np.uint8)
    lengths, vals, table_log, sym_t, nb_t = _table_from(datas)
    tbl8 = pallas_huf.expand_dtable8(sym_t, nb_t, table_log)
    blobs = [bytearray(huf.encode_stream(d, vals, lengths)) for d in datas]
    blobs[1][0] ^= 0xFF  # corrupt mid-stream bits -> wrong final position
    region = np.frombuffer(b"".join(bytes(b) for b in blobs), dtype=np.uint8)
    lens = np.asarray([len(b) for b in blobs], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    with pytest.raises(ValueError, match="corrupt HUF stream"):
        pallas_huf.decode_shared_table(region, starts, lens, tbl8, seg)


def test_encode_kernel_interpret_matches_golden(interpret_kernels):
    seg = 128
    datas = np.clip(RNG.normal(100, 9, size=(6, seg)), 0, 255).astype(np.uint8)
    lengths, vals, table_log, sym_t, nb_t = _table_from(datas)
    tbl8e = pallas_huf_enc.pack_etable8(vals, lengths)
    rows, bits = pallas_huf_enc.encode_shared_table(datas[:, ::-1], tbl8e, seg)
    rows_h = np.ascontiguousarray(rows).astype("<u4").view(np.uint8)
    bits_h = np.asarray(bits)
    for i, d in enumerate(datas):
        want = huf.encode_stream(d, vals, lengths)
        nbytes = (int(bits_h[i]) + 7) // 8
        assert nbytes == len(want)
        assert bytes(rows_h.reshape(len(datas), -1)[i, :nbytes]) == want


def test_fused_roundtrip_interpret(interpret_kernels):
    """engine="tpu" shared profile end to end through the interpreted
    kernels (split + histogram + pallas encode + assembly; fused pallas
    decode + combine), byte-identical to the numpy golden engine."""
    from zipnn_tpu import ZipNN

    n = 16 * 1024
    vals = (RNG.standard_normal(n // 2) * 0.05).astype(np.float32)
    data = ((vals.view(np.uint32) >> 16).astype(np.uint16)).tobytes()[:n]

    z_np = ZipNN(engine="numpy", huffman_table="shared", compression_chunk=1024)
    z_tpu = ZipNN(engine="tpu", huffman_table="shared", compression_chunk=1024)
    golden = z_np.compress(data)
    comp = z_tpu.compress(data)
    assert comp == golden
    assert bytes(z_tpu.decompress(comp)) == data


def test_fused_encode_overflow_reencode_interpret(interpret_kernels):
    """One adversarial chunk in an otherwise compressible plane overflows
    its optimistic output row; the host re-encode path must keep the
    container byte-identical to the numpy engine."""
    from zipnn_tpu import ZipNN

    chunk = 1024
    n_chunks = 24
    # low-entropy plane data drives sw_for_expected down...
    exp = np.full((n_chunks, chunk // 2), 190, np.uint8)
    exp += RNG.integers(0, 2, size=exp.shape).astype(np.uint8)
    # ...but one chunk is near-uniform: long codes, overflowing its row
    exp[5] = RNG.integers(0, 256, size=chunk // 2, dtype=np.uint8)
    man = RNG.integers(0, 256, size=(n_chunks, chunk // 2), dtype=np.uint8)
    # interleave as bf16 LE pairs (mantissa byte, exponent-ish byte)
    data = np.stack([man, exp], axis=-1).reshape(-1).tobytes()

    z_np = ZipNN(engine="numpy", huffman_table="shared", compression_chunk=chunk)
    z_tpu = ZipNN(engine="tpu", huffman_table="shared", compression_chunk=chunk)
    golden = z_np.compress(data)
    comp = z_tpu.compress(data)
    assert comp == golden
    assert bytes(z_tpu.decompress(comp)) == data


def test_const_scan_kernel_interpret(interpret_kernels):
    """pallas_gather.const_scan_rows (the sampled fused-encode RLE scan)
    through the Pallas interpreter: packed flags must match the direct
    numpy formulation, including the non-multiple-of-block tail rows."""
    rng = np.random.default_rng(3)
    N, W = 70, 128  # 2 full 32-row blocks + a 6-row XLA tail
    rows = rng.integers(0, 2**32, (N, W), dtype=np.uint32)
    rows[5] = np.uint32(0x2A2A2A2A)   # constant byte 0x2A
    rows[41] = np.uint32(0)           # constant byte 0
    rows[69] = np.uint32(0x11111111)  # constant in the tail part
    rows[7, 64] ^= np.uint32(0xFF)    # almost-constant: not RLE
    rows[7, :64] = np.uint32(0x33333333)
    rows[7, 65:] = np.uint32(0x33333333)
    import jax.numpy as jnp

    from zipnn_tpu.ops import pallas_gather as pg

    flags = np.asarray(pg.const_scan_rows(jnp.asarray(rows)))
    b0 = rows[:, 0] & 0xFF
    ok = (rows == (b0 * np.uint32(0x01010101))[:, None]).all(axis=1)
    want = (b0.astype(np.int32) | (ok.astype(np.int32) << 8))
    assert np.array_equal(flags, want)
