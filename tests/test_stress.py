"""Stress/roundtrip matrix mirroring the reference suite
(tests/simple_stress_tests.py): sizes bracketing chunk boundaries,
streaming chunk sweeps, delta byte/file +- streaming, fp32, fp8.
"""
import numpy as np
import pytest

from zipnn_tpu import ZipNN

RNG = np.random.default_rng(17)

# sizes bracketing the 256 KB chunk boundary (reference :19-21)
SIZES = [
    255 * 1024 - 1, 256 * 1024, 256 * 1024 + 1,
    512 * 1024 + 777, 1024 * 1024, 2 * 1024 * 1024 + 17,
]


def _weights_bytes(n, seed=0):
    rng = np.random.default_rng(seed)
    vals = (rng.standard_normal(n // 2 + 1) * 0.05).astype(np.float32)
    return ((vals.view(np.uint32) >> 16).astype(np.uint16)).tobytes()[:n]


@pytest.mark.parametrize("size", SIZES)
def test_byte_roundtrip_chunk_boundaries(size):
    data = _weights_bytes(size)
    z = ZipNN()
    c = z.compress(data)
    assert ZipNN().decompress(c) == data


@pytest.mark.parametrize("streaming_chunk", [2**19, 2**21, 2**24])
def test_streaming_chunk_sizes(streaming_chunk):
    data = _weights_bytes(3 * 1024 * 1024 + 13)
    z = ZipNN(is_streaming=True, streaming_chunk=streaming_chunk)
    c = z.compress(data)
    assert ZipNN(is_streaming=True).decompress(c) == data
    # a non-streaming reader also walks the frames (header flag drives it)
    assert ZipNN().decompress(c) == data


@pytest.mark.parametrize("streaming", [False, True])
def test_delta_byte_roundtrip(streaming):
    data = _weights_bytes(700_000, seed=1)
    base = _weights_bytes(700_000, seed=2)
    z = ZipNN(delta_compressed_type="byte", is_streaming=streaming)
    c = z.compress(data, delta_second_data=base)
    out = ZipNN(delta_compressed_type="byte", is_streaming=streaming).decompress(
        c, delta_second_data=base
    )
    assert out == data


def test_delta_file_roundtrip(tmp_path):
    data = _weights_bytes(300_000, seed=3)
    base = _weights_bytes(300_000, seed=4)
    basef = str(tmp_path / "base.bin")
    with open(basef, "wb") as f:
        f.write(base)
    z = ZipNN(delta_compressed_type="file")
    c = z.compress(data, delta_second_data=basef)
    out = ZipNN(delta_compressed_type="file").decompress(c, delta_second_data=basef)
    assert out == data


def test_delta_mismatch_errors():
    data = _weights_bytes(1000)
    base = _weights_bytes(999)
    with pytest.raises(ValueError):
        ZipNN(delta_compressed_type="byte").compress(data, delta_second_data=base)
    c = ZipNN().compress(data)
    with pytest.raises(ValueError):
        # compressed without delta, decompressed with delta
        ZipNN(delta_compressed_type="byte").decompress(c, delta_second_data=data)


@pytest.mark.parametrize("streaming", [False, True])
def test_float32_roundtrip(streaming):
    arr = (RNG.standard_normal(300_000) * 0.05).astype(np.float32)
    data = arr.tobytes()
    z = ZipNN(bytearray_dtype="float32", is_streaming=streaming)
    c = z.compress(data)
    assert ZipNN(bytearray_dtype="float32", is_streaming=streaming).decompress(c) == data


def test_fp8_torch_roundtrip():
    torch = pytest.importorskip("torch")
    t = (torch.randn(300, 401) * 0.2).to(torch.float8_e4m3fn)
    z = ZipNN(input_format="torch")
    c = z.compress(t)
    back = ZipNN(input_format="torch").decompress(c)
    assert back.dtype == t.dtype
    assert torch.equal(back.view(torch.uint8), t.view(torch.uint8))


def test_corrupt_container_rejected():
    data = _weights_bytes(600_000)
    c = bytearray(ZipNN().compress(data))
    c[0] = 0x58  # break the magic
    with pytest.raises(ValueError):
        ZipNN().decompress(bytes(c))
    c2 = bytearray(ZipNN().compress(data))
    with pytest.raises(Exception):
        ZipNN().decompress(bytes(c2[: len(c2) // 2]))  # truncated


def test_incompressible_noise_all_engines():
    data = RNG.integers(0, 256, size=600_000, dtype=np.uint8).tobytes()
    blobs = {}
    for engine in ("numpy", "native"):
        z = ZipNN(engine=engine)
        c = z.compress(data)
        assert ZipNN(engine=engine).decompress(c) == data
        blobs[engine] = bytes(c)
    assert blobs["numpy"] == blobs["native"]
