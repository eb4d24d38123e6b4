"""io.serving.ShardDecoder: back-to-back container decode.

On CPU every container takes the generic fallback (the fast path needs a
real TPU) — these tests pin the API, ordering, fallback routing, and
error paths; the hardware test asserts pipelined bit-exactness and the
bucketed-geometry compile reuse.
"""
import numpy as np
import pytest

from zipnn_tpu import ZipNN
from zipnn_tpu.io.serving import ShardDecoder, decompress_iter


def _bf16(n_bytes, seed=3):
    rng = np.random.default_rng(seed)
    vals = (rng.standard_normal(n_bytes // 2) * 0.05).astype(np.float32)
    return ((vals.view(np.uint32) >> 16).astype("<u2")).tobytes()[:n_bytes]


def _shards(k=3, size=300_000):
    outs, blobs = [], []
    for i in range(k):
        data = _bf16(size + i * 7, seed=10 + i)
        outs.append(data)
        blobs.append(bytes(ZipNN(engine="numpy").compress(data)))
    return outs, blobs


def test_iter_order_and_bit_exactness():
    outs, blobs = _shards()
    got = list(decompress_iter(blobs))
    assert [bytes(g) for g in got] == outs


def test_single_decompress():
    outs, blobs = _shards(k=1)
    assert bytes(ShardDecoder().decompress(blobs[0])) == outs[0]


def test_streaming_container_falls_back():
    data = _bf16(3 * 1024 * 1024 + 11, seed=7)
    blob = bytes(
        ZipNN(engine="numpy", is_streaming=True, streaming_chunk=1024 * 1024)
        .compress(data)
    )
    assert bytes(ShardDecoder().decompress(blob)) == data


def test_mixed_sizes_keep_order():
    outs, blobs = _shards(k=4, size=123_456)
    got = [bytes(g) for g in ShardDecoder().decompress_iter(blobs, depth=3)]
    assert got == outs


def test_delta_rejected():
    data = _bf16(100_000)
    base = _bf16(100_000, seed=9)
    z = ZipNN(engine="numpy", delta_compressed_type="byte")
    blob = bytes(z.compress(data, delta_second_data=base))
    with pytest.raises(ValueError, match="delta"):
        ShardDecoder().decompress(blob)


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="ZN"):
        ShardDecoder().decompress(b"XX" + b"\0" * 64)


def test_bucket_up():
    from zipnn_tpu.ops.jax_decode import _bucket_up

    assert _bucket_up(0, 512) == 0
    assert _bucket_up(1, 512) == 512
    assert _bucket_up(512, 512) == 512
    assert _bucket_up(513, 512) == 1024
    assert _bucket_up(949, 256) == 1024


@pytest.mark.tpu
def test_tpu_pipelined_shards_bit_exact_and_share_kernels():
    """Real chip: N similar shards through one ShardDecoder decode
    bit-exactly AND share compiled kernel geometry (bucketed caps) — the
    kernel cache must not grow per shard."""
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs a real TPU")
    from zipnn_tpu.ops import pallas_huf_pc as pc

    outs, blobs = _shards(k=3, size=8 * 1024 * 1024)
    dec = ShardDecoder()
    first = bytes(dec.decompress(blobs[0]))
    assert first == outs[0]
    info0 = pc._decode_call_cached.cache_info()
    got = [bytes(g) for g in dec.decompress_iter(blobs)]
    assert got == outs
    info1 = pc._decode_call_cached.cache_info()
    assert info1.misses == info0.misses, (
        "similar shards recompiled the decode kernel"
    )
