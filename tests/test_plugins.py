"""Plugin-layer tests: safetensors per-tensor codec + SafeOpen, hf helpers.

Mirrors the reference's safetensors roundtrip coverage
(tests/simple_stress_tests.py:222-263) using our from-scratch plugin.
"""
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
safetensors = pytest.importorskip("safetensors")

from safetensors.torch import save_file  # noqa: E402

from zipnn_tpu.plugins.safetensors import (  # noqa: E402
    METADATA_KEY,
    SafeOpen,
    compress_tensor,
    decompress_tensor,
    get_compressed_tensors_metadata,
    set_compressed_tensors_metadata,
)


def _model_tensors():
    g = torch.Generator().manual_seed(7)
    return {
        "w.bf16": torch.randn(1000, 257, generator=g).to(torch.bfloat16),
        "w.fp32": torch.randn(333, 77, generator=g),
        "w.fp16": torch.randn(64, 129, generator=g).to(torch.float16),
        "b.int64": torch.arange(100, dtype=torch.int64),
    }


def _write_compressed_safetensors(path):
    tensors = _model_tensors()
    out = {}
    infos = {}
    for name, t in tensors.items():
        if not t.dtype.is_floating_point:
            out[name] = t
            continue
        res = compress_tensor(t)
        if res is None:
            out[name] = t
            continue
        blob, info = res
        out[name] = blob
        infos[name] = info
    metadata = {"format": "pt"}
    set_compressed_tensors_metadata(infos, metadata)
    save_file(out, path, metadata=metadata)
    return tensors, infos


def test_tensor_roundtrip_direct():
    t = torch.randn(517, 31).to(torch.bfloat16)
    blob, info = compress_tensor(t)
    assert blob.dtype == torch.uint8
    assert info["dtype"] == "bfloat16"
    back = decompress_tensor(blob)
    assert back.dtype == t.dtype and back.shape == t.shape
    assert torch.equal(back.view(torch.uint16), t.view(torch.uint16))


def test_safe_open_roundtrip(tmp_path):
    path = str(tmp_path / "model.znn.safetensors")
    tensors, infos = _write_compressed_safetensors(path)
    assert infos, "expected at least one tensor to compress"

    with SafeOpen(path, framework="pt") as f:
        assert set(f.compressed_tensors_metadata) == set(infos)
        for name, orig in tensors.items():
            got = f.get_tensor(name)
            assert got.dtype == orig.dtype, name
            if orig.dtype == torch.bfloat16:
                assert torch.equal(got.view(torch.uint16), orig.view(torch.uint16))
            else:
                assert torch.equal(got, orig), name
        # uncompressed tensors slice fine; compressed ones refuse
        assert f.get_slice("b.int64") is not None
        with pytest.raises(NotImplementedError):
            f.get_slice("w.bf16")


def test_safe_open_numpy_framework(tmp_path):
    path = str(tmp_path / "model.znn.safetensors")
    tensors, _ = _write_compressed_safetensors(path)
    with SafeOpen(path, framework="np") as f:
        got = f.get_tensor("w.fp32")
        assert isinstance(got, np.ndarray) and got.dtype == np.float32
        assert np.array_equal(got, tensors["w.fp32"].numpy())


def test_safe_open_jax_framework(tmp_path):
    jnp = pytest.importorskip("jax.numpy")
    path = str(tmp_path / "model.znn.safetensors")
    tensors, _ = _write_compressed_safetensors(path)
    with SafeOpen(path, framework="pt") as f:
        pass  # file is valid
    f = SafeOpen(path, framework="flax")
    got = f.get_tensor("w.bf16")
    assert got.dtype == jnp.bfloat16
    want = tensors["w.bf16"].view(torch.uint16).numpy()
    assert np.array_equal(np.asarray(got).view(np.uint16), want)


def test_metadata_schema_roundtrip():
    md = {"format": "pt"}
    infos = {"a": {"dtype": "bfloat16", "shape": "[2, 3]"}}
    set_compressed_tensors_metadata(infos, md)
    assert json.loads(md[METADATA_KEY]) == infos
    assert get_compressed_tensors_metadata(md) == infos
    assert get_compressed_tensors_metadata(None) == {}
    assert get_compressed_tensors_metadata({}) == {}


def test_zipnn_safetensors_patch_installs():
    import safetensors.torch as st

    original = st.safe_open
    try:
        from zipnn_tpu import zipnn_safetensors

        zipnn_safetensors()
        assert st.safe_open is SafeOpen
    finally:
        st.safe_open = original


def test_hf_replace_in_file(tmp_path):
    from zipnn_tpu.plugins.hf import replace_in_file

    p = str(tmp_path / "index.json")
    with open(p, "w") as f:
        f.write('{"weight_map": {"a": "model.safetensors.znn"}}')
    replace_in_file(p, "model.safetensors.znn", "model.safetensors")
    with open(p) as f:
        assert ".znn" not in f.read()


def test_hf_from_pretrained_end_to_end(tmp_path):
    """Full serving path: a local tiny GPT-2 whose safetensors shard is
    replaced by a .znn file loads through the patched from_pretrained
    with replace_local_file=True (reference flow: zipnn.py:1418-1519;
    plain zipnn_hf() intercepts hub-cache loads, which bypass local-dir
    isfile probes)."""
    transformers = pytest.importorskip("transformers")
    import os

    from transformers import GPT2Config, GPT2LMHeadModel, modeling_utils

    orig_lsd = modeling_utils.load_state_dict
    orig_fp = modeling_utils.PreTrainedModel.from_pretrained
    orig_cf = modeling_utils.cached_file
    try:
        cfg = GPT2Config(
            n_embd=32, n_layer=2, n_head=2, n_positions=64,
            vocab_size=128, attn_implementation="eager",
        )
        model = GPT2LMHeadModel(cfg)
        d = str(tmp_path / "tiny-gpt2")
        model.save_pretrained(d, safe_serialization=True)

        from zipnn_tpu import ZipNN, zipnn_hf

        plain = os.path.join(d, "model.safetensors")
        with open(plain, "rb") as f:
            raw = f.read()
        comp = ZipNN(is_streaming=True).compress(raw)
        with open(plain + ".znn", "wb") as f:
            f.write(comp)
        os.remove(plain)  # only the compressed shard remains

        zipnn_hf(replace_local_file=True)
        loaded = GPT2LMHeadModel.from_pretrained(d)
        assert os.path.exists(plain)  # shard restored in place
        assert not os.path.exists(plain + ".znn")
        want = model.state_dict()
        got = loaded.state_dict()
        assert want.keys() == got.keys()
        for k in want:
            assert torch.equal(want[k], got[k]), k
    finally:
        modeling_utils.load_state_dict = orig_lsd
        modeling_utils.PreTrainedModel.from_pretrained = orig_fp
        modeling_utils.cached_file = orig_cf


def test_hf_load_state_dict_patch(tmp_path, monkeypatch):
    """zipnn_hf() patches load_state_dict to open .safetensors.znn files."""
    transformers = pytest.importorskip("transformers")
    from transformers import modeling_utils

    orig_lsd = modeling_utils.load_state_dict
    orig_fp = modeling_utils.PreTrainedModel.from_pretrained
    orig_cf = modeling_utils.cached_file
    try:
        from zipnn_tpu import ZipNN, zipnn_hf

        zipnn_hf()
        # build a compressed whole-file safetensors checkpoint
        plain = str(tmp_path / "model.safetensors")
        t = torch.randn(64, 65).to(torch.bfloat16)
        save_file({"w": t}, plain, metadata={"format": "pt"})
        with open(plain, "rb") as f:
            raw = f.read()
        znn = ZipNN(is_streaming=True)
        comp = znn.compress(raw)
        czn = plain + ".znn"
        with open(czn, "wb") as f:
            f.write(comp)
        sd = modeling_utils.load_state_dict(czn)
        assert torch.equal(sd["w"].view(torch.uint16), t.view(torch.uint16))
    finally:
        modeling_utils.load_state_dict = orig_lsd
        modeling_utils.PreTrainedModel.from_pretrained = orig_fp
        modeling_utils.cached_file = orig_cf
