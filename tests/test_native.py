"""Cross-validation: native C++ core vs the numpy golden model.

The native engine must produce *byte-identical* containers (same Huffman
lengths, same FSE weight tables, same framing) and each side must decode the
other's output.
"""
import numpy as np
import pytest

from zipnn_tpu import codec
from zipnn_tpu.ops.entropy import huf as pyhuf

native = pytest.importorskip("zipnn_tpu.native")

RNG = np.random.default_rng(123)


def _cases():
    for n in [1, 11, 12, 500, 4096, 130000, 128 * 1024]:
        yield RNG.integers(0, 256, n).astype(np.uint8)
        yield (RNG.normal(128, 8, n).clip(0, 255)).astype(np.uint8)
        yield np.full(n, 3, np.uint8)
        yield (RNG.zipf(1.4, n) % 256).astype(np.uint8)


def test_huf_block_byte_identical():
    for data in _cases():
        c_nat = native.huf_compress(data)
        c_py = pyhuf.compress(data)
        assert (c_nat is None) == (c_py is None)
        if c_nat is None:
            continue
        assert c_nat == c_py


def test_huf_block_cross_decode():
    for data in _cases():
        c = pyhuf.compress(data)
        if c is None:
            continue
        assert np.array_equal(native.huf_decompress(c, data.size), data)
        assert np.array_equal(pyhuf.decompress(c, data.size), data)


@pytest.mark.parametrize(
    "num_buf,byte_reorder,bit_reorder",
    [(2, 10, 1), (2, 10, 0), (4, 220, 1), (1, 10, 0)],
)
def test_payload_cross_engine(num_buf, byte_reorder, bit_reorder):
    chunk = 128 * 1024 if num_buf == 1 else 256 * 1024
    for n in [0, 1, 255, chunk - 1, chunk, chunk + 3, 3 * chunk + 77]:
        data = (RNG.normal(100, 6, n).clip(0, 255)).astype(np.uint8)
        p_nat = native.compress_payload(data, num_buf, bit_reorder, byte_reorder, chunk, 0.95, 4)
        p_py = codec.compress_payload_numpy(data, num_buf, bit_reorder, byte_reorder, chunk, 0.95)
        assert p_nat == p_py
        d_nat = native.decompress_payload(p_py, num_buf, bit_reorder, byte_reorder, chunk, n, 4)
        d_py = codec.decompress_payload_numpy(p_nat, num_buf, bit_reorder, byte_reorder, chunk, n)
        assert np.array_equal(d_nat, data)
        assert np.array_equal(d_py, data)


def test_zipnn_auto_engine_uses_native_and_matches():
    import torch

    from zipnn_tpu import ZipNN

    t = torch.randn(700, 333, dtype=torch.bfloat16)
    c_auto = bytes(ZipNN(input_format="torch", engine="auto").compress(t))
    c_np = bytes(ZipNN(input_format="torch", engine="numpy").compress(t))
    assert c_auto == c_np
    d = ZipNN(input_format="torch", engine="auto").decompress(c_np)
    assert torch.equal(d, t)


@pytest.mark.parametrize(
    "num_buf,byte_reorder,bit_reorder",
    [(2, 10, 1), (2, 10, 0), (4, 220, 1), (1, 10, 0)],
)
def test_shared_profile_cross_engine(num_buf, byte_reorder, bit_reorder):
    """Native shared-table (TPU-optimal) profile must be byte-identical to
    the numpy specification, including RLE planes, raw planes, and the
    ragged tail."""
    chunk = 32 * 1024
    for n in [0, 1, 255, chunk - 1, chunk, chunk + 3, 3 * chunk + 77]:
        data = (RNG.normal(100, 6, n).clip(0, 255)).astype(np.uint8)
        if n >= chunk:
            data[:chunk // 2] = 7  # constant region: RLE / skewed cells
        p_nat = native.compress_payload_shared(
            data, num_buf, bit_reorder, byte_reorder, chunk, 0.95, 4
        )
        p_py = codec.compress_payload_numpy(
            data, num_buf, bit_reorder, byte_reorder, chunk, 0.95,
            shared_tables=True,
        )
        assert p_nat == p_py, (num_buf, byte_reorder, bit_reorder, n)
        d = codec.decompress_payload_numpy(
            p_nat, num_buf, bit_reorder, byte_reorder, chunk, n
        )
        assert np.array_equal(d, data)


def test_shared_profile_incompressible_and_rle():
    rnd = RNG.integers(0, 256, 70_000, dtype=np.uint8)
    for data in (rnd, np.zeros(70_000, np.uint8)):
        p_nat = native.compress_payload_shared(data, 2, 1, 10, 32 * 1024, 0.95, 2)
        p_py = codec.compress_payload_numpy(
            data, 2, 1, 10, 32 * 1024, 0.95, shared_tables=True
        )
        assert p_nat == p_py


def test_zipnn_shared_auto_routes_native():
    from zipnn_tpu import ZipNN

    data = (RNG.normal(100, 5, 300_000).clip(0, 255)).astype(np.uint8).tobytes()
    c_auto = bytes(
        ZipNN(engine="auto", huffman_table="shared",
              compression_chunk=32768).compress(data)
    )
    c_np = bytes(
        ZipNN(engine="numpy", huffman_table="shared",
              compression_chunk=32768).compress(data)
    )
    assert c_auto == c_np
    assert bytes(ZipNN(engine="auto").decompress(c_auto)) == data
