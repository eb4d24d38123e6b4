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


def test_tensor_format_frames_decode_flat():
    """torch/numpy-format frames (shape extension after the header) yield
    the flat decompressed buffer."""
    torch = pytest.importorskip("torch")

    t = torch.randn(257, 129, dtype=torch.float32) * 0.03
    blob = bytes(ZipNN(input_format="torch", engine="numpy").compress(t))
    flat = ShardDecoder().decompress(blob)
    assert bytes(flat) == t.numpy().tobytes()


def test_as_numpy_yields_owned_arrays():
    outs, blobs = _shards(k=2)
    got = list(ShardDecoder(as_numpy=True).decompress_iter(blobs))
    for g, want in zip(got, outs):
        assert isinstance(g, np.ndarray) and g.dtype == np.uint8
        assert g.flags.writeable
        assert g.tobytes() == want


def test_safeopen_get_tensors_matches_get_tensor(tmp_path):
    """SafeOpen.get_tensors (pipelined bulk path) is bit-identical to
    per-name get_tensor, including uncompressed entries."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("safetensors")
    from safetensors.torch import save_file

    from zipnn_tpu.plugins.safetensors import (
        SafeOpen, compress_tensor, set_compressed_tensors_metadata,
    )

    tensors = {
        "w.bf16": (torch.randn(64, 96) * 0.02).to(torch.bfloat16),
        "w.f32": torch.randn(33, 17) * 0.01,
        "idx": torch.arange(100, dtype=torch.int32),  # stored raw
    }
    out, infos = {}, {}
    for name, t in tensors.items():
        r = compress_tensor(t) if t.is_floating_point() else None
        if r is None:
            out[name] = t
        else:
            out[name], infos[name] = r
    meta = {"format": "pt"}
    set_compressed_tensors_metadata(infos, meta)
    path = str(tmp_path / "m.safetensors")
    save_file(out, path, metadata=meta)

    with SafeOpen(path, "pt") as f:
        bulk = f.get_tensors()
        assert set(bulk) == set(tensors)
        for name in tensors:
            one = f.get_tensor(name)
            assert bulk[name].dtype == one.dtype
            assert bulk[name].shape == one.shape
            assert torch.equal(
                bulk[name].view(torch.uint8) if one.dtype.is_floating_point
                else bulk[name],
                one.view(torch.uint8) if one.dtype.is_floating_point else one,
            )


def test_load_pytree_bulk_matches_save(tmp_path):
    pytest.importorskip("torch")
    pytest.importorskip("safetensors")
    import jax.numpy as jnp

    from zipnn_tpu.io.pytree import load_pytree, save_pytree

    rng = np.random.default_rng(5)
    tree = {
        "layer": {
            "w": jnp.asarray(
                rng.standard_normal((128, 64)).astype(np.float32) * 0.02
            ).astype(jnp.bfloat16),
            "b": jnp.asarray(rng.standard_normal(64).astype(np.float32)),
        },
        "step": jnp.asarray(np.int32(7)),
    }
    path = str(tmp_path / "ckpt.znn.safetensors")
    save_pytree(path, tree, engine="numpy")
    got = load_pytree(path, like=tree)
    import jax

    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(tree)[0],
        jax.tree_util.tree_flatten_with_path(got)[0],
    ):
        na, nb = np.asarray(a), np.asarray(b)
        assert na.dtype == nb.dtype and na.shape == nb.shape, kp
        assert np.array_equal(
            na.reshape(-1).view(np.uint8), nb.reshape(-1).view(np.uint8)
        ), kp


def test_decompress_all_fallback_cpu_order_and_bits():
    outs, blobs = _shards(k=3)
    got = ShardDecoder(as_numpy=True).decompress_all(blobs)
    assert [g.tobytes() for g in got] == outs


def test_decompress_all_requires_mutable_output():
    with pytest.raises(ValueError, match="to_device"):
        ShardDecoder().decompress_all([])


def test_stage_returns_none_off_tpu():
    _outs, blobs = _shards(k=1)
    assert ShardDecoder().stage(blobs[0]) is None


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


@pytest.mark.tpu
def test_tpu_staged_deferred_decode_bit_exact():
    """Real chip: fully staged shards through decompress_all (deferred
    one-fetch validation) are bit-exact and in order."""
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs a real TPU")
    outs, blobs = _shards(k=3, size=8 * 1024 * 1024)
    dec = ShardDecoder(as_numpy=True)
    staged = [dec.stage(b) for b in blobs]
    assert all(s is not None for s in staged)
    assert all(s.upload_bytes > 0 for s in staged)
    got = dec.decompress_all(staged)
    assert [bytes(g) for g in got] == outs
    # mixing raw blobs and staged handles preserves order
    got2 = dec.decompress_all([blobs[0], staged[1], blobs[2]])
    assert [bytes(g) for g in got2] == outs


# ---------------------------------------------------------------------------
# ShardEncoder: pipelined multi-container compress (the encode twin)
# ---------------------------------------------------------------------------
from zipnn_tpu.io.serving import ShardEncoder  # noqa: E402


def _enc_bufs(k=3, size=200_000):
    return [_bf16(size + i * 13, seed=40 + i) for i in range(k)]


def test_encoder_matches_zipnn_and_keeps_order():
    bufs = _enc_bufs(k=4)
    z = ZipNN(engine="numpy", huffman_table="shared")
    enc = ShardEncoder(zipnn=ZipNN(engine="numpy", huffman_table="shared"))
    outs = enc.compress_all(bufs)
    assert [bytes(o) for o in outs] == [bytes(z.compress(b)) for b in bufs]
    # and the containers roundtrip through the decode twin
    got = [bytes(g) for g in ShardDecoder().decompress_iter(outs)]
    assert got == bufs


def test_encoder_default_is_tpu_engine_profile():
    # engine="tpu" on a CPU platform routes through the generic device
    # path — containers must still equal ZipNN(engine="tpu").compress
    bufs = _enc_bufs(k=2, size=120_000)
    zt = ZipNN(engine="tpu", huffman_table="shared")
    outs = ShardEncoder().compress_all(bufs)
    assert [bytes(o) for o in outs] == [bytes(zt.compress(b)) for b in bufs]


def test_encoder_fallback_configs_roundtrip():
    data = _enc_bufs(k=1)[0]
    # streaming config falls back to ZipNN.compress (whole streamed frame)
    zs = ZipNN(engine="numpy", is_streaming=True, streaming_chunk=65536)
    o = ShardEncoder(zipnn=zs).compress(data)
    assert bytes(zs.decompress(bytes(o))) == data
    # per-chunk (non-shared) profile falls back too
    zp = ZipNN(engine="numpy")
    o2 = ShardEncoder(zipnn=zp).compress(data)
    assert bytes(o2) == bytes(zp.compress(data))
    assert bytes(zp.decompress(bytes(o2))) == data


def test_encoder_mixed_fallback_stream_keeps_order():
    # interleave sizes small enough to fall below one full chunk with
    # regular ones: every container must come back in submit order
    bufs = [_bf16(700, seed=1), _enc_bufs(k=1)[0], _bf16(900, seed=2)]
    z = ZipNN(engine="numpy", huffman_table="shared")
    enc = ShardEncoder(zipnn=ZipNN(engine="numpy", huffman_table="shared"))
    outs = [bytes(o) for o in enc.compress_iter(bufs)]
    assert outs == [bytes(z.compress(b)) for b in bufs]


def test_encoder_pool_staging_no_leak():
    # pool_staging on a non-fast-path platform acquires + releases; the
    # global pool must stay bounded and results stay correct
    bufs = _enc_bufs(k=3)
    z = ZipNN(engine="numpy", huffman_table="shared")
    enc = ShardEncoder(
        zipnn=ZipNN(engine="numpy", huffman_table="shared"),
        pool_staging=True,
    )
    outs = [bytes(o) for o in enc.compress_iter(bufs)]
    assert outs == [bytes(z.compress(b)) for b in bufs]


@pytest.mark.tpu
def test_tpu_encoder_pipelined_bit_identical():
    """Real chip: the pipelined fast path (device dispatches of shard N+1
    submitted before shard N's host assembly) produces containers
    byte-identical to one-at-a-time ZipNN.compress, in order, including
    with pooled staging (views consumed per yield)."""
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs a real TPU")
    bufs = _enc_bufs(k=3, size=8 * 1024 * 1024 + 1234)
    zt = ZipNN(engine="tpu", huffman_table="shared")
    ref = [bytes(zt.compress(b)) for b in bufs]
    enc = ShardEncoder(pool_staging=True)
    outs = [bytes(o) for o in enc.compress_iter(bufs)]
    assert outs == ref
    # and they decode back bit-exactly through the decode twin
    got = [bytes(g) for g in ShardDecoder().decompress_iter(outs)]
    assert got == bufs
