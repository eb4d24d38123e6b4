"""Compressed jax-pytree checkpointing (io/pytree.py): save/load
roundtrips, treedef reconstruction, sharded placement on the virtual
mesh, and reference-schema compatibility."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import ml_dtypes

from zipnn_tpu.io import load_pytree, save_pytree

RNG = np.random.default_rng(31)


def _tree():
    w = jnp.asarray(
        (RNG.standard_normal((256, 128)) * 0.05).astype(np.float32)
    ).astype(jnp.bfloat16)
    return {
        "params": {
            "dense": {"kernel": w, "bias": jnp.zeros(128, jnp.float32)},
            "emb": jnp.asarray(
                (RNG.standard_normal((64, 32)) * 0.01).astype(np.float32)
            ),
        },
        "step": jnp.asarray(7, jnp.int32).reshape(1),
        "noise": jnp.asarray(
            RNG.integers(0, 2**16, (32, 64), dtype=np.uint16)
        ).view(jnp.bfloat16),  # incompressible: keep-raw rule
    }


def _assert_tree_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        assert x.dtype == y.dtype, (x.dtype, y.dtype)
        xv = np.asarray(x)
        yv = np.asarray(y)
        if xv.dtype == ml_dtypes.bfloat16:
            assert np.array_equal(xv.view(np.uint16), yv.view(np.uint16))
        else:
            assert np.array_equal(xv, yv)


def test_save_load_roundtrip(tmp_path):
    tree = _tree()
    p = str(tmp_path / "ckpt.znn.safetensors")
    compressed = save_pytree(p, tree)
    assert compressed["params/dense/kernel"] is True
    assert compressed["step"] is False  # int leaf stores raw
    assert compressed["noise"] is False  # keep-raw-if-bigger
    # nested-dict load (no `like`)
    got = load_pytree(p)
    _assert_tree_equal(tree, got)
    assert set(got) == {"params", "step", "noise"}
    # treedef reconstruction
    got2 = load_pytree(p, like=tree)
    assert (
        jax.tree_util.tree_structure(got2)
        == jax.tree_util.tree_structure(tree)
    )
    _assert_tree_equal(tree, got2)


def test_load_sharded_on_mesh(tmp_path):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    tree = _tree()
    p = str(tmp_path / "ckpt.znn.safetensors")
    save_pytree(p, tree)
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("x", "y"))
    sh = {
        "params/dense/kernel": NamedSharding(mesh, P("x", "y")),
        "params/emb": NamedSharding(mesh, P("x", None)),
    }
    got = load_pytree(p, like=tree, shardings=sh)
    k = got["params"]["dense"]["kernel"]
    assert k.sharding == sh["params/dense/kernel"]
    assert len(k.sharding.device_set) == 8
    _assert_tree_equal(tree, got)
    # single-Sharding broadcast form: replicate everything
    rep = NamedSharding(mesh, P())
    got3 = load_pytree(p, like=tree, shardings=lambda name: rep)
    assert got3["step"].sharding == rep


def test_reference_schema_compat(tmp_path):
    """The file is a normal znn_compressed_vectors safetensors: the
    plugins layer (and therefore the reference ecosystem) reads it."""
    import torch

    from zipnn_tpu.plugins.safetensors import SafeOpen

    tree = _tree()
    p = str(tmp_path / "ckpt.znn.safetensors")
    save_pytree(p, tree)
    with SafeOpen(p, "pt", "cpu") as f:
        t = f.get_tensor("params/dense/kernel")
        assert t.dtype == torch.bfloat16
        want = np.asarray(tree["params"]["dense"]["kernel"])
        assert np.array_equal(
            t.view(torch.uint16).numpy(), want.view(np.uint16)
        )


def test_like_mismatch_errors(tmp_path):
    tree = _tree()
    p = str(tmp_path / "ckpt.znn.safetensors")
    save_pytree(p, tree)
    with pytest.raises(KeyError):
        load_pytree(p, like={"params": tree["params"], "missing": tree["step"]})
    with pytest.raises(ValueError):
        load_pytree(p, like={"step": tree["step"]})  # extra leaves on disk


def test_shared_profile_roundtrip(tmp_path):
    """huffman_table='shared' (the TPU-optimal decode profile) per tensor:
    the container self-describes, so load needs no knob."""
    tree = _tree()
    p = str(tmp_path / "ckpt.znn.safetensors")
    compressed = save_pytree(p, tree, huffman_table="shared")
    assert compressed["params/dense/kernel"] is True
    _assert_tree_equal(tree, load_pytree(p, like=tree))


def test_separator_in_key_rejected():
    """A dict key containing the '/' path separator would silently re-nest
    on the no-``like`` load path — leaf_paths rejects it loudly."""
    from zipnn_tpu.io.pytree import leaf_paths

    with pytest.raises(ValueError, match="separator"):
        leaf_paths({"a/b": np.zeros(4, np.float32)})


def test_single_leaf_tree(tmp_path):
    x = jnp.asarray(np.arange(512, dtype=np.float32))
    p = str(tmp_path / "one.znn.safetensors")
    save_pytree(p, x)
    got = load_pytree(p)
    assert np.array_equal(np.asarray(got), np.asarray(x))
