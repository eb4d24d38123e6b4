"""Bitstream / FSE / HUF codec tests."""
import numpy as np
import pytest

from zipnn_tpu.ops.entropy import bitstream, fse, huf


# ---------------------------------------------------------------------------
# bitstream
# ---------------------------------------------------------------------------

def test_bitwriter_reader_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        fields = [
            (int(rng.integers(0, 1 << n)), n)
            for n in rng.integers(1, 24, int(rng.integers(1, 200)))
        ]
        w = bitstream.BitWriter()
        for v, n in fields:
            w.add(v, n)
        data = w.close()
        r = bitstream.BitReader(data)
        for v, n in reversed(fields):
            assert r.read(n) == v
        assert r.finished and not r.overflowed


def test_bitreader_sentinel_position():
    w = bitstream.BitWriter()
    w.add(0b101, 3)
    data = w.close()  # payload 3 bits + sentinel -> one byte 0b00001101
    assert data == bytes([0b1101])
    r = bitstream.BitReader(data)
    assert r.bits_left == 3
    assert r.read(3) == 0b101


def test_bitreader_overflow_zero_pads_low():
    w = bitstream.BitWriter()
    w.add(0b11, 2)
    data = w.close()
    r = bitstream.BitReader(data)
    v = r.read(5)  # only 2 real bits: they become the high bits, rest 0
    assert v == 0b11000
    assert r.overflowed


def test_missing_sentinel_rejected():
    with pytest.raises(ValueError):
        bitstream.BitReader(b"\x12\x00")
    with pytest.raises(ValueError):
        bitstream.BitReader(b"")


# ---------------------------------------------------------------------------
# FSE
# ---------------------------------------------------------------------------

def test_ncount_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(100):
        max_sv = int(rng.integers(1, 40))
        counts = rng.integers(0, 1000, max_sv + 1)
        counts[int(rng.integers(0, max_sv + 1))] += 1000  # ensure some mass
        total = int(counts.sum())
        tl = fse.optimal_table_log(9, total, max_sv)
        norm = fse.normalize_count(list(counts), tl, total, max_sv)
        assert sum(abs(x) if x == -1 else x for x in norm) >= (1 << tl)
        assert sum(x for x in norm if x > 0) + sum(1 for x in norm if x == -1) == 1 << tl
        hdr = fse.write_ncount(norm, max_sv, tl)
        norm2, max_sv2, tl2, consumed = fse.read_ncount(hdr)
        assert tl2 == tl
        assert consumed == len(hdr)
        # trailing zeros beyond the last counted symbol are not transmitted
        assert norm2 == norm[: len(norm2)]
        assert all(v == 0 for v in norm[len(norm2):])


def test_fse_roundtrip_various():
    rng = np.random.default_rng(2)
    for trial in range(150):
        n = int(rng.integers(3, 400))
        hi = int(rng.integers(2, 13))
        data = rng.integers(0, hi, n).astype(np.uint8)
        c = fse.compress(list(data), max_symbol_value=12, max_table_log=6)
        if isinstance(c, str):
            continue
        assert fse.decompress(c, max_out=n + 2) == list(data)


def test_fse_rle_and_incompressible_markers():
    assert fse.compress([5] * 50, 12, 6) == fse.RLE
    assert fse.compress([0], 12, 6) == fse.INCOMPRESSIBLE
    assert fse.compress(list(range(13)) [:12], 12, 6) == fse.INCOMPRESSIBLE  # all unique


def test_fse_exact_output_length():
    """Output count must be recovered purely from the stream end."""
    rng = np.random.default_rng(3)
    for n in [3, 4, 5, 6, 7, 50, 255]:
        data = (rng.integers(0, 3, n) * 2).astype(np.uint8)  # symbols 0,2,4
        c = fse.compress(list(data), 12, 6)
        if isinstance(c, str):
            continue
        out = fse.decompress(c, max_out=255)
        assert len(out) == n


# ---------------------------------------------------------------------------
# HUF
# ---------------------------------------------------------------------------

def _roundtrip(data: np.ndarray):
    c = huf.compress(data)
    if c is None:
        return None
    out = huf.decompress(c, data.size)
    assert np.array_equal(out, data)
    return c


def test_huf_roundtrip_matrix():
    rng = np.random.default_rng(4)
    cases = []
    for n in [12, 13, 100, 1000, 65536, 128 * 1024]:
        cases.append((rng.normal(128, 6, n).clip(0, 255)).astype(np.uint8))
        cases.append(rng.integers(0, 3, n).astype(np.uint8))
        cases.append((rng.zipf(1.3, n) % 256).astype(np.uint8))
    for data in cases:
        c = _roundtrip(data)
        if c is not None:
            assert len(c) < data.size


def test_huf_rle_block():
    data = np.full(5000, 7, np.uint8)
    c = huf.compress(data)
    assert c == b"\x07"  # 1-byte RLE block
    assert np.array_equal(huf.decompress(c, 5000), data)


def test_huf_raw_passthrough_decode():
    """cSrcSize == dstSize means a stored (uncompressed) block."""
    data = np.arange(256, dtype=np.uint8)
    out = huf.decompress(data.tobytes(), 256)
    assert np.array_equal(out, data)


def test_huf_incompressible_returns_none():
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 4096).astype(np.uint8)
    assert huf.compress(data) is None


def test_huf_oversize_block_refused():
    data = np.zeros(128 * 1024 + 1, np.uint8)
    data[0] = 1  # avoid RLE
    assert huf.compress(data) is None


def test_huf_small_blocks():
    rng = np.random.default_rng(6)
    for n in range(1, 30):
        data = rng.integers(0, 2, n).astype(np.uint8)
        c = huf.compress(data)
        if c is not None:
            assert np.array_equal(huf.decompress(c, n), data)


def test_huf_all_256_symbols_uses_fse_weights():
    """With all symbols present, the 4-bit raw weight header is impossible:
    the FSE-compressed weight path must be taken."""
    rng = np.random.default_rng(7)
    data = np.concatenate(
        [np.arange(256, dtype=np.uint8).repeat(4), (rng.normal(100, 3, 60000).clip(0, 255)).astype(np.uint8)]
    )
    c = huf.compress(data)
    assert c is not None
    assert c[0] < 128  # FSE-compressed weights header marker
    assert np.array_equal(huf.decompress(c, data.size), data)


def test_huf_package_merge_limit():
    """A zipf-ish distribution forcing lengths beyond the table log."""
    rng = np.random.default_rng(8)
    freqs = np.array([2 ** max(0, 16 - i) for i in range(60)])
    data = np.repeat(np.arange(60, dtype=np.uint8), freqs)
    rng.shuffle(data)
    c = huf.compress(data[: 128 * 1024])
    assert c is not None
    got = huf.decompress(c, min(data.size, 128 * 1024))
    assert np.array_equal(got, data[: 128 * 1024])


def test_huf_jump_table_layout():
    rng = np.random.default_rng(9)
    data = (rng.normal(50, 2, 40000).clip(0, 255)).astype(np.uint8)
    c = huf.compress(data)
    assert c is not None
    weights, ranks, tl, nsym, consumed = huf.read_stats(c)
    rest = c[consumed:]
    l1 = int.from_bytes(rest[0:2], "little")
    l2 = int.from_bytes(rest[2:4], "little")
    l3 = int.from_bytes(rest[4:6], "little")
    assert 6 + l1 + l2 + l3 < len(rest)  # 4th stream has nonzero size
