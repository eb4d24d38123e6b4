"""Streaming safetensors reader: range reads, sharding, znn decompression."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

from zipnn_tpu.io import SafetensorsStreamReader, partition_names  # noqa: E402
from zipnn_tpu.plugins.safetensors import (  # noqa: E402
    compress_tensor,
    set_compressed_tensors_metadata,
)


def _write_file(path, compressed=True):
    g = torch.Generator().manual_seed(9)
    tensors = {
        "big": torch.randn(500, 400, generator=g).to(torch.bfloat16),
        "mid": torch.randn(100, 300, generator=g),
        "small": torch.arange(64, dtype=torch.int64),
    }
    out, infos = {}, {}
    for name, t in tensors.items():
        if compressed and t.dtype.is_floating_point:
            res = compress_tensor(t)
            if res is not None:
                out[name], infos[name] = res
                continue
        out[name] = t
    md = {"format": "pt"}
    if infos:
        set_compressed_tensors_metadata(infos, md)
    save_file(out, path, metadata=md)
    return tensors


def test_range_reads_and_decompression(tmp_path):
    path = str(tmp_path / "m.safetensors")
    tensors = _write_file(path)
    with SafetensorsStreamReader(path) as r:
        assert set(r.keys()) == set(tensors)
        assert "big" in r.compressed
        got = r.get_tensor("big")
        want = tensors["big"].view(torch.uint16).numpy()
        assert np.array_equal(got.view(np.uint16), want)
        assert np.array_equal(r.get_tensor("mid"), tensors["mid"].numpy())
        assert np.array_equal(r.get_tensor("small"), tensors["small"].numpy())


def test_get_tensor_device(tmp_path):
    jnp = pytest.importorskip("jax.numpy")
    path = str(tmp_path / "m.safetensors")
    tensors = _write_file(path)
    r = SafetensorsStreamReader(path)
    x = r.get_tensor("big", device=True)
    assert x.dtype == jnp.bfloat16
    assert x.shape == tuple(tensors["big"].shape)


def test_partitioning_covers_exactly_once():
    entries = [(f"t{i}", (i * 37) % 91 + 1) for i in range(23)]
    n = 4
    shards = [partition_names(entries, n, h) for h in range(n)]
    everything = [x for s in shards for x in s]
    assert sorted(everything) == sorted(e[0] for e in entries)
    # size balance: no host more than 2x the lightest
    loads = [sum(dict(entries)[x] for x in s) for s in shards]
    assert max(loads) <= 2 * max(min(loads), 1)


def test_load_shard_union_is_whole_file(tmp_path):
    path = str(tmp_path / "m.safetensors")
    tensors = _write_file(path)
    r = SafetensorsStreamReader(path)
    seen = {}
    for h in range(3):
        seen.update(r.load_shard(n_hosts=3, host_id=h))
    assert set(seen) == set(tensors)
