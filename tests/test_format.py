"""Header / shape-extension / frame-walk format tests (layer 1)."""
import numpy as np
import pytest

from zipnn_tpu.core.header import (
    HEADER_LEN,
    Header,
    pack_shape,
    unpack_shape,
    walk_frames,
)


def test_header_roundtrip_all_fields():
    hdr = Header(
        byte_reorder=10,
        bit_reorder=1,
        method=1,
        input_format=2,
        delta_mode=1,
        lossy_type=0,
        lossy_factor=27,
        lossy_is_int=0,
        is_streaming=True,
        streaming_chunk=1 << 20,
        compression_chunk=1 << 18,
        dtype_code=6,
        original_len=12345678,
        total_len=999,
        shape=(3, 4, 5),
    )
    raw = hdr.to_bytes()
    back, consumed = Header.from_bytes(raw)
    assert consumed == len(raw)
    assert back.byte_reorder == 10
    assert back.bit_reorder == 1
    assert back.method == 1
    assert back.input_format == 2
    assert back.delta_mode == 1
    assert back.is_streaming
    assert back.streaming_chunk == 1 << 20
    assert back.compression_chunk == 1 << 18
    assert back.dtype_code == 6
    assert back.original_len == 12345678
    assert back.total_len == 999
    assert back.shape == (3, 4, 5)


def test_header_golden_layout():
    """Byte-for-byte layout per the reference writer (zipnn.py:373-394)."""
    hdr = Header(
        byte_reorder=220,
        bit_reorder=1,
        method=0,
        input_format=1,
        compression_chunk=256 * 1024,
        dtype_code=1,
        original_len=1,
        total_len=33,
    )
    raw = hdr.to_bytes()
    assert raw[0:2] == b"ZN"
    assert raw[2:5] == bytes([0, 5, 3])
    assert raw[5] == 220
    assert raw[6] == 1
    assert raw[7] == 0
    assert raw[8] == 1
    assert raw[13] == 0  # not streaming
    assert raw[14] == 18  # log2(256 KB)
    assert raw[15] == 1
    assert raw[16:24] == (1).to_bytes(8, "little")
    assert raw[24:32] == (33).to_bytes(8, "little")
    assert len(raw) == HEADER_LEN


def test_streaming_byte13():
    hdr = Header(is_streaming=True, streaming_chunk=1 << 21, compression_chunk=1 << 18)
    assert hdr.to_bytes()[13] == 128 + 21


def test_shape_packing_widths():
    for shape in [(), (1,), (255,), (256,), (65535,), (65536,), (2**32,), (7, 300, 70000, 2**33)]:
        packed = pack_shape(shape)
        got, consumed = unpack_shape(packed + b"trailing")
        assert got == shape
        assert consumed == len(packed)


def test_shape_golden_bytes():
    # ndim, then (width, value) pairs — reference util_torch.py:89-118
    assert pack_shape((5,)) == bytes([1, 1, 5])
    assert pack_shape((300,)) == bytes([1, 2]) + (300).to_bytes(2, "little")
    assert pack_shape((3, 70000)) == bytes([2, 1, 3, 4]) + (70000).to_bytes(4, "little")


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        Header.from_bytes(b"XX" + bytes(30))


def test_walk_frames():
    h1 = Header(compression_chunk=1 << 18, total_len=40).to_bytes() + b"12345678"
    h2 = Header(compression_chunk=1 << 18, total_len=35).to_bytes() + b"abc"
    frames = list(walk_frames(h1 + h2))
    assert frames == [(0, 40), (40, 35)]
