"""Sharded (multi-chip) pipeline tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from zipnn_tpu import ZipNN, parallel  # noqa: E402
from zipnn_tpu import codec  # noqa: E402


def _bf16ish(n):
    rng = np.random.default_rng(3)
    vals = (rng.standard_normal(n // 2 + 1) * 0.05).astype(np.float32)
    return ((vals.view(np.uint32) >> 16).astype(np.uint16)).view(np.uint8)[:n].copy()


def test_mesh_shapes():
    mesh = parallel.make_mesh(jax.devices())
    assert int(np.prod(mesh.devices.shape)) == len(jax.devices())
    mesh1 = parallel.make_mesh(jax.devices()[:3])
    assert mesh1.axis_names == ("chip",)


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_payload_parity(ndev):
    mesh = parallel.make_mesh(jax.devices()[:ndev])
    data = _bf16ish(8192 * 11 + 77)
    want = codec.compress_payload_numpy(data, 2, 1, 10, 8192)
    with parallel.use_mesh(mesh):
        from zipnn_tpu.ops import jax_codec

        got = jax_codec.compress_payload(data, 2, 1, 10, 8192)
        assert got == want
        back = jax_codec.decompress_payload(want, 2, 1, 10, 8192, data.size)
    assert np.array_equal(back, data)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.dtype == jax.numpy.uint32
    # the fused step reproduces the original words of the synthetic buffer
    # only for huffman cells; shape sanity is the contract here
    assert out.ndim == 2


@pytest.mark.tpu
def test_mesh_engine_tpu_on_chip():
    """Ambient 1-device mesh on real hardware: engine='tpu' compress and
    decompress run the shard_mapped stages and stay byte-identical to the
    numpy golden model."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs a real TPU")
    data = bytes(_bf16ish(2 * 1024 * 1024))
    mesh = parallel.make_mesh()
    with parallel.use_mesh(mesh):
        c = ZipNN(engine="tpu", compression_chunk=32768).compress(data)
        back = ZipNN(engine="tpu", compression_chunk=32768).decompress(bytes(c))
    ref = ZipNN(engine="numpy", compression_chunk=32768).compress(data)
    assert back == data
    assert bytes(c) == bytes(ref)
