"""Byte-plane split/combine + sign-rotation transforms vs a scalar model."""
import numpy as np
import pytest

from zipnn_tpu.ops import byte_group as bg


def scalar_reorder16(buf: bytes) -> bytes:
    """Direct transliteration of the per-uint32 C semantics (dtype16.c:10-29)."""
    out = bytearray(buf)
    for i in range(0, len(buf) // 4 * 4, 4):
        u = int.from_bytes(buf[i : i + 4], "little")
        v = ((u << 1) & 0xFF00FF00) | ((u >> 8) & 0x800080) | (u & 0x7F007F)
        out[i : i + 4] = v.to_bytes(4, "little")
    return bytes(out)


def scalar_reorder32(buf: bytes) -> bytes:
    out = bytearray(buf)
    for i in range(0, len(buf) // 4 * 4, 4):
        u = int.from_bytes(buf[i : i + 4], "little")
        v = ((u << 1) & 0xFF000000) | ((u >> 8) & 0x800000) | (u & 0x7FFFFF)
        out[i : i + 4] = v.to_bytes(4, "little")
    return bytes(out)


@pytest.mark.parametrize("n", [0, 1, 2, 3, 4, 5, 6, 7, 8, 101, 1024, 4097])
def test_reorder16_matches_scalar(n):
    rng = np.random.default_rng(n)
    buf = rng.integers(0, 256, n).astype(np.uint8)
    assert bg.reorder_sign_16(buf).tobytes() == scalar_reorder16(buf.tobytes())
    # inverse
    assert bg.revert_sign_16(bg.reorder_sign_16(buf)).tobytes() == buf.tobytes()


@pytest.mark.parametrize("n", [0, 4, 8, 100, 4096])
def test_reorder32_matches_scalar(n):
    rng = np.random.default_rng(n)
    buf = rng.integers(0, 256, n).astype(np.uint8)
    assert bg.reorder_sign_32(buf).tobytes() == scalar_reorder32(buf.tobytes())
    assert bg.revert_sign_32(bg.reorder_sign_32(buf)).tobytes() == buf.tobytes()


def test_reorder16_tail_untouched():
    """The C reorder processes uint32 pairs only: a 2-byte tail passes through."""
    buf = np.array([0xFF, 0xFF, 0xAB, 0xCD, 0x12, 0x34], dtype=np.uint8)
    out = bg.reorder_sign_16(buf)
    assert out[4] == 0x12 and out[5] == 0x34


def test_reorder16_semantics():
    """bf16 0xC2A5 = [s=1 e=10000101 m=0100101] -> [e s m] = 0x85A5... check bits."""
    # lane value little-endian: bytes (0xA5, 0xC2) twice to fill a word
    buf = np.array([0xA5, 0xC2, 0xA5, 0xC2], dtype=np.uint8)
    out = bg.reorder_sign_16(buf)
    u = int.from_bytes(out[:2].tobytes(), "little")
    orig = 0xC2A5
    exp = (orig << 1) & 0xFF00
    sign = (orig >> 8) & 0x80
    man = orig & 0x7F
    assert u == exp | sign | man


@pytest.mark.parametrize("num_buf,byte_reorder", [(1, 10), (2, 10), (4, 220)])
@pytest.mark.parametrize("n", [0, 1, 2, 3, 4, 5, 7, 8, 9, 1023, 1024, 1025, 65536])
def test_split_combine_roundtrip(num_buf, byte_reorder, n):
    rng = np.random.default_rng(n * 7 + num_buf)
    buf = rng.integers(0, 256, n).astype(np.uint8)
    for bit_reorder in (0, 1) if num_buf > 1 else (0,):
        planes = bg.split(buf, num_buf, byte_reorder, bit_reorder)
        assert [p.size for p in planes] == bg.plane_lengths(n, num_buf, byte_reorder)
        out = bg.combine(planes, n, num_buf, byte_reorder, bit_reorder)
        assert np.array_equal(out, buf)


def test_split_plane_contents():
    buf = np.arange(12, dtype=np.uint8)
    p = bg.split(buf, 4, 220, 0)
    assert np.array_equal(p[0], [0, 4, 8])
    assert np.array_equal(p[1], [1, 5, 9])
    assert np.array_equal(p[3], [3, 7, 11])
    p2 = bg.split(buf[:5], 2, 10, 0)
    assert np.array_equal(p2[0], [0, 2, 4])  # odd: extra byte to plane 0
    assert np.array_equal(p2[1], [1, 3])


def test_truncate_modes():
    buf = np.arange(10, dtype=np.uint8)
    lsb = bg.split(buf, 2, 1, 0)
    assert np.array_equal(lsb[0], [0, 2, 4, 6, 8]) and lsb[1].size == 0
    out = bg.combine(lsb, 10, 2, 1, 0)
    assert np.array_equal(out[0::2], [0, 2, 4, 6, 8]) and (out[1::2] == 0).all()
    msb = bg.split(buf, 2, 8, 0)
    assert np.array_equal(msb[0], [1, 3, 5, 7, 9])
    out = bg.combine(msb, 10, 2, 8, 0)
    assert np.array_equal(out[1::2], [1, 3, 5, 7, 9]) and (out[0::2] == 0).all()


def test_fp32_values_roundtrip():
    rng = np.random.default_rng(0)
    vals = rng.normal(0, 1e3, 1000).astype(np.float32)
    raw = vals.view(np.uint8)
    planes = bg.split(raw, 4, 220, 1)
    out = bg.combine(planes, raw.size, 4, 220, 1)
    assert np.array_equal(out.view(np.float32), vals)
