"""ZipNN API roundtrip matrix, mirroring the reference test strategy
(tests/test_one_model.py and tests/simple_stress_tests.py sizes/configs)."""
import numpy as np
import pytest
import torch

from zipnn_tpu import ZipNN

KB = 1024
RNG = np.random.default_rng(42)


def bf16_bytes(n_elems: int) -> bytes:
    return (
        torch.randn(n_elems, dtype=torch.float32).to(torch.bfloat16).view(torch.uint16).numpy().tobytes()
    )


# sizes bracketing the 256 KB chunk boundary (simple_stress_tests.py:19-21)
BOUNDARY_SIZES = [
    0,
    1,
    2,
    3,
    17,
    255 * KB - 1,
    256 * KB - 1,
    256 * KB,
    256 * KB + 1,
    512 * KB + 511,
    (2 * KB + 77) * KB + 3,
]


@pytest.mark.parametrize("n", BOUNDARY_SIZES)
def test_byte_bf16_roundtrip_boundaries(n):
    data = bf16_bytes((n + 1) // 2)[:n]
    zp = ZipNN(input_format="byte", bytearray_dtype="bfloat16", engine="numpy")
    c = zp.compress(data)
    assert bytes(zp.decompress(c)) == data


@pytest.mark.parametrize("dtype", [torch.float32, torch.bfloat16, torch.float16])
def test_torch_roundtrip_dtypes(dtype):
    t = torch.randn(517, 203).to(dtype)
    zp = ZipNN(input_format="torch", engine="numpy")
    c = zp.compress(t)
    d = zp.decompress(c)
    assert d.dtype == dtype and d.shape == t.shape
    assert torch.equal(t, d)


@pytest.mark.parametrize("dtype", [torch.float8_e4m3fn, torch.float8_e5m2])
def test_torch_fp8_roundtrip(dtype):
    t = torch.randn(300, 100).to(dtype)
    zp = ZipNN(input_format="torch", engine="numpy")
    c = zp.compress(t)
    d = zp.decompress(c)
    assert d.dtype == dtype
    assert torch.equal(t.view(torch.uint8), d.view(torch.uint8))


@pytest.mark.parametrize("dtype", [np.float32, np.float16])
def test_numpy_roundtrip(dtype):
    a = RNG.normal(0, 1, (129, 65)).astype(dtype)
    zp = ZipNN(input_format="numpy", engine="numpy")
    c = zp.compress(a)
    d = zp.decompress(c)
    assert d.dtype == dtype and d.shape == a.shape
    assert np.array_equal(a, d)


def test_jax_roundtrip_bf16():
    import jax.numpy as jnp

    x = jnp.asarray(RNG.normal(0, 1, (64, 33)), dtype=jnp.bfloat16)
    zp = ZipNN(input_format="jax", engine="numpy")
    c = zp.compress(x)
    d = zp.decompress(c)
    assert d.dtype == jnp.bfloat16 and tuple(d.shape) == (64, 33)
    assert (np.asarray(d) == np.asarray(x)).all()


@pytest.mark.parametrize("streaming_chunk", [2**17, 2**20])
def test_streaming_frames(streaming_chunk):
    data = bf16_bytes(300 * KB)  # 600 KB
    zp = ZipNN(
        input_format="byte",
        bytearray_dtype="bfloat16",
        is_streaming=True,
        streaming_chunk=streaming_chunk,
        engine="numpy",
    )
    c = zp.compress(data)
    # every frame header carries the streaming marker
    assert c[13] == 128 + streaming_chunk.bit_length() - 1
    zp2 = ZipNN(
        input_format="byte",
        bytearray_dtype="bfloat16",
        is_streaming=True,
        streaming_chunk=streaming_chunk,
        engine="numpy",
    )
    assert bytes(zp2.decompress(c)) == data


@pytest.mark.parametrize("huffman_table", ["per_chunk", "shared"])
def test_streaming_tpu_engine_parity(huffman_table):
    """Streaming frames through the tpu engine: byte-identical to numpy
    for both profiles (each frame is an independent container, so the
    per-frame chunk count stays below the sampling gate) and the ragged
    final frame decodes bit-exactly."""
    data = bf16_bytes(1500 * KB)[: 2_999_111]
    kw = dict(
        input_format="byte", bytearray_dtype="bfloat16",
        is_streaming=True, streaming_chunk=1 << 20,
        compression_chunk=32768, huffman_table=huffman_table,
    )
    c_np = bytes(ZipNN(engine="numpy", **kw).compress(data))
    c_tp = bytes(ZipNN(engine="tpu", **kw).compress(data))
    assert c_tp == c_np
    back = ZipNN(engine="tpu", is_streaming=True).decompress(c_np)
    assert bytes(back) == data


def test_delta_byte_roundtrip():
    base = bf16_bytes(100 * KB)
    mod = bytearray(base)
    for i in range(0, len(mod), 1000):
        mod[i] ^= 1
    mod = bytes(mod)
    zp = ZipNN(
        input_format="byte", bytearray_dtype="bfloat16", delta_compressed_type="byte", engine="numpy"
    )
    c = zp.compress(mod, delta_second_data=base)
    assert bytes(zp.decompress(c, delta_second_data=base)) == mod
    # delta of identical data compresses massively
    c_same = zp.compress(base, delta_second_data=base)
    assert len(c_same) < len(base) / 50


def test_delta_file_roundtrip(tmp_path):
    base = bf16_bytes(64 * KB)
    p = tmp_path / "base.bin"
    p.write_bytes(base)
    mod = bytes(bytearray(b ^ 2 for b in base))
    zp = ZipNN(
        input_format="byte", bytearray_dtype="bfloat16", delta_compressed_type="file", engine="numpy"
    )
    c = zp.compress(mod, delta_second_data=str(p))
    assert bytes(zp.decompress(c, delta_second_data=str(p))) == mod


def test_delta_mismatch_rejected():
    zp = ZipNN(input_format="byte", bytearray_dtype="bfloat16", engine="numpy")
    c = zp.compress(b"\x00" * 100)
    zp_delta = ZipNN(
        input_format="byte", bytearray_dtype="bfloat16", delta_compressed_type="byte", engine="numpy"
    )
    with pytest.raises(ValueError):
        zp_delta.decompress(c, delta_second_data=b"\x00" * 100)


def test_streaming_delta_roundtrip():
    base = bf16_bytes(128 * KB)
    mod = bytes(bytearray(b ^ 1 for b in base))
    zp = ZipNN(
        input_format="byte",
        bytearray_dtype="bfloat16",
        is_streaming=True,
        streaming_chunk=2**17,
        delta_compressed_type="byte",
        engine="numpy",
    )
    c = zp.compress(mod, delta_second_data=base)
    assert bytes(zp.decompress(c, delta_second_data=base)) == mod


def test_incompressible_stays_near_size():
    data = RNG.integers(0, 256, 300 * KB).astype(np.uint8).tobytes()
    zp = ZipNN(input_format="byte", bytearray_dtype="bfloat16", engine="numpy")
    c = zp.compress(data)
    # all chunks stored raw: overhead = header + tables only
    assert len(c) < len(data) * 1.01
    assert bytes(zp.decompress(c)) == data


def test_ratio_parity_on_synthetic_bf16():
    """~66% of original on gaussian bf16 (reference README.md:192-194)."""
    t = torch.randn(1024 * 512, dtype=torch.bfloat16)
    zp = ZipNN(input_format="torch", engine="numpy")
    c = zp.compress(t)
    ratio = len(c) / (t.numel() * 2)
    assert 0.60 < ratio < 0.70


def test_compression_chunk_validation():
    with pytest.raises(ValueError):
        ZipNN(compression_chunk=1000)
    with pytest.raises(ValueError):
        ZipNN(streaming_chunk=999)
    with pytest.raises(ValueError):
        ZipNN(input_format="torch", is_streaming=True)


def test_metadata_dump(tmp_path, capsys):
    t = torch.randn(8, 8, dtype=torch.bfloat16)
    zp = ZipNN(input_format="torch", engine="numpy")
    c = zp.compress(t)
    meta = ZipNN().metadata(bytes(c))
    assert meta["dtype"] == "BFLOAT16"
    assert meta["shape_bytes"] == (8, 8)
    assert meta["original_len"] == "128 Bytes"
    p = tmp_path / "x.znn"
    p.write_bytes(bytes(c))
    meta2 = ZipNN().metadata(str(p))
    assert meta2 == meta


def test_vanilla_zstd_path_roundtrip():
    """Explicit byte_reorder selects the whole-buffer method path
    (reference compress_bin:697; our reader actually supports it)."""
    data = bf16_bytes(64 * KB)
    zp = ZipNN(
        input_format="byte",
        bytearray_dtype="bfloat16",
        method="zstd",
        byte_reorder=0b0_00_01_001,
        engine="numpy",
    )
    c = zp.compress(data)
    zp2 = ZipNN(
        input_format="byte", bytearray_dtype="bfloat16", method="zstd", byte_reorder=0b0_00_01_001, engine="numpy"
    )
    assert bytes(zp2.decompress(c)) == data


def test_vanilla_reference_double_header_reads():
    """The reference's vanilla writer emits the 32-byte header twice with
    only the outer copy's total_len updated (reference zipnn.py:700-703:
    ``ba_comp = header + compress_method(ba)`` then
    ``header[24:32] = len(ba_comp)+32`` then ``header + ba_comp``).  Build
    a frame byte-for-byte that way and assert our reader decodes it."""
    data = bf16_bytes(64 * KB)
    zp = ZipNN(
        input_format="byte", bytearray_dtype="bfloat16", method="zstd",
        byte_reorder=0b0_00_01_001, engine="numpy",
    )
    ours = bytes(zp.compress(data))
    outer = bytearray(ours[:32])
    body = ours[32:]
    # the inner header is the pre-update copy: total_len still zero
    inner = bytearray(outer)
    inner[24:32] = (0).to_bytes(8, "little")
    ba_comp = bytes(inner) + body
    outer[24:32] = (len(ba_comp) + 32).to_bytes(8, "little")  # ref formula
    ref_frame = bytes(outer) + ba_comp
    assert len(ref_frame) == len(ours) + 32
    zp2 = ZipNN(
        input_format="byte", bytearray_dtype="bfloat16", method="zstd",
        byte_reorder=0b0_00_01_001, engine="numpy",
    )
    assert bytes(zp2.decompress(ref_frame)) == data
    # and our own single-header frames still decode (no false positive)
    zp3 = ZipNN(
        input_format="byte", bytearray_dtype="bfloat16", method="zstd",
        byte_reorder=0b0_00_01_001, engine="numpy",
    )
    assert bytes(zp3.decompress(ours)) == data


def test_container_layout_golden():
    """Verify the payload wire layout directly: chunk-type table rows,
    little-endian cumulative sizes, plane-major data (zipnn_core.c:105-153)."""
    n = 256 * KB + 100  # 2 chunks
    data = bf16_bytes(n // 2)[:n]
    zp = ZipNN(input_format="byte", bytearray_dtype="bfloat16", engine="numpy")
    c = bytes(zp.compress(data))
    assert c[:2] == b"ZN"
    num_buf, n_chunks = 2, 2
    types = np.frombuffer(c[32 : 32 + num_buf * n_chunks], dtype=np.uint8).reshape(num_buf, n_chunks)
    cum = np.frombuffer(
        c[32 + num_buf * n_chunks : 32 + num_buf * n_chunks + 8 * num_buf * n_chunks], dtype="<u8"
    ).reshape(num_buf, n_chunks)
    assert set(types.ravel()) <= {0, 1}
    # cumulative sizes are nondecreasing per plane and account for all bytes
    assert (np.diff(cum, axis=1) >= 0).all()
    data_len = len(c) - 32 - num_buf * n_chunks * 9
    assert int(cum[:, -1].sum()) == data_len
    assert int.from_bytes(c[24:32], "little") == len(c)


# ---------------------------------------------------------------------------
# lossy INTEGER codec (reference P6, zipnn.py:869-901 / util_torch.py:9-63)
# ---------------------------------------------------------------------------

def test_lossy_integer_roundtrip_fp32():
    torch = pytest.importorskip("torch")
    from zipnn_tpu import ZipNN

    g = torch.Generator().manual_seed(3)
    t = torch.randn(257, 33, generator=g)  # values ~N(0,1) << 2^(31-20)
    factor = 20
    z = ZipNN(input_format="torch", lossy_compressed_type="integer",
              lossy_compressed_factor=factor)
    c = z.compress(t)
    back = ZipNN(input_format="torch").decompress(c)
    assert back.dtype == t.dtype and back.shape == t.shape
    # quantization error bounded by one step
    assert torch.max(torch.abs(back - t)).item() <= 2.0 ** -factor
    # and it actually compresses better than lossless on noisy data
    lossless = ZipNN(input_format="torch").compress(t)
    assert len(c) < len(lossless)


def test_lossy_integer_fallback_when_out_of_range():
    torch = pytest.importorskip("torch")
    from zipnn_tpu import ZipNN

    t = torch.randn(64, 64) * 1e30  # overflows any int32 scaling
    z = ZipNN(input_format="torch", lossy_compressed_type="integer",
              lossy_compressed_factor=27)
    c = z.compress(t)
    back = ZipNN(input_format="torch").decompress(c)
    assert torch.equal(back, t)  # lossless fallback, bit-exact


def test_lossy_integer_bf16():
    torch = pytest.importorskip("torch")
    from zipnn_tpu import ZipNN

    t = (torch.randn(100, 41) * 0.1).to(torch.bfloat16)
    factor = 8
    z = ZipNN(input_format="torch", lossy_compressed_type="integer",
              lossy_compressed_factor=factor)
    c = z.compress(t)
    back = ZipNN(input_format="torch").decompress(c)
    assert back.dtype == torch.bfloat16
    assert torch.max(torch.abs(back.float() - t.float())).item() <= 2.0 ** -(factor - 1)


def test_lossy_unsign_raises():
    torch = pytest.importorskip("torch")
    from zipnn_tpu import ZipNN

    z = ZipNN(input_format="torch", lossy_compressed_type="unsign")
    with pytest.raises(ValueError):
        z.compress(torch.randn(8, 8))


def test_lossy_requires_torch_format():
    from zipnn_tpu import ZipNN

    with pytest.raises(ValueError):
        ZipNN(input_format="byte", lossy_compressed_type="integer")
