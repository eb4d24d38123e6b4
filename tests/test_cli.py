"""CLI surface tests: drive the module entry points end-to-end on real files.

Mirrors the reference's inline `--verification` roundtrip strategy
(scripts/zipnn_compress_file.py:128-139).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(mod, *args, input_text=""):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", f"zipnn_tpu.cli.{mod}", *args],
        capture_output=True, text=True, input=input_text, env=env, timeout=300,
    )


def _bf16_file(path, n=300_000, seed=5):
    rng = np.random.default_rng(seed)
    vals = (rng.standard_normal(n // 2) * 0.05).astype(np.float32)
    data = ((vals.view(np.uint32) >> 16).astype(np.uint16)).tobytes()[:n]
    with open(path, "wb") as f:
        f.write(data)
    return data


def test_compress_decompress_file_roundtrip(tmp_path):
    src = str(tmp_path / "weights.bin")
    data = _bf16_file(src)
    r = run_cli("compress_file", src, "--force", "--verification")
    assert r.returncode == 0, r.stderr
    assert "Verification OK" in r.stdout
    assert os.path.exists(src + ".znn")

    os.remove(src)
    r = run_cli("decompress_file", src + ".znn", "--force", "--delete")
    assert r.returncode == 0, r.stderr
    assert not os.path.exists(src + ".znn")
    with open(src, "rb") as f:
        assert f.read() == data


def test_compress_file_test_flag_writes_nothing(tmp_path):
    src = str(tmp_path / "w.bin")
    _bf16_file(src)
    r = run_cli("compress_file", src, "--test")
    assert r.returncode == 0, r.stderr
    assert not os.path.exists(src + ".znn")


def test_compress_file_shared_profile(tmp_path):
    src = str(tmp_path / "w.bin")
    data = _bf16_file(src)
    r = run_cli(
        "compress_file", src, "--force", "--verification",
        "--huffman_table", "shared", "--compression_chunk", "16384",
    )
    assert r.returncode == 0, r.stderr
    r = run_cli("decompress_file", src + ".znn", "--force")
    assert r.returncode == 0, r.stderr
    with open(src, "rb") as f:
        assert f.read() == data


def test_delta_roundtrip(tmp_path):
    src = str(tmp_path / "ckpt.bin")
    base = str(tmp_path / "base.bin")
    data = _bf16_file(src, seed=1)
    _bf16_file(base, seed=2)
    r = run_cli("compress_file_delta", src, base, "--force", "--verification")
    assert r.returncode == 0, r.stderr
    os.remove(src)
    r = run_cli("decompress_file_delta", src + ".znn", base, "--force")
    assert r.returncode == 0, r.stderr
    with open(src, "rb") as f:
        assert f.read() == data


def test_safetensors_per_tensor_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file, load_file

    src = str(tmp_path / "model.safetensors")
    t = torch.randn(300, 257).to(torch.bfloat16)
    i = torch.arange(10)
    save_file({"w": t, "i": i}, src, metadata={"format": "pt"})

    r = run_cli("compress_safetensors", src, "--force")
    assert r.returncode == 0, r.stderr
    out = str(tmp_path / "model.znn.safetensors")
    assert os.path.exists(out)

    os.remove(src)
    r = run_cli("decompress_safetensors", out, "--force")
    assert r.returncode == 0, r.stderr
    back = load_file(src)
    assert torch.equal(back["w"].view(torch.uint16), t.view(torch.uint16))
    assert torch.equal(back["i"], i)


def test_path_batch_roundtrip(tmp_path):
    d = tmp_path / "ckpts"
    d.mkdir()
    datas = {}
    for i in range(3):
        p = str(d / f"shard{i}.bin")
        datas[p] = _bf16_file(p, n=50_000, seed=i)
    r = run_cli("compress_path", "bin", "--path", str(d), "--force")
    assert r.returncode == 0, r.stderr
    for p in datas:
        assert os.path.exists(p + ".znn")
        os.remove(p)
    r = run_cli("decompress_path", "--path", str(d), "--force", "--delete")
    assert r.returncode == 0, r.stderr
    for p, data in datas.items():
        with open(p, "rb") as f:
            assert f.read() == data
        assert not os.path.exists(p + ".znn")


def test_index_json_rewrite(tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    idx = {"weight_map": {"a": "model-00001.safetensors"}}
    with open(d / "model.safetensors.index.json", "w") as f:
        json.dump(idx, f)
    from zipnn_tpu.cli.compress_path import rewrite_index_json

    rewrite_index_json(str(d), add_suffix=True)
    with open(d / "model.safetensors.index.json") as f:
        assert json.load(f)["weight_map"]["a"] == "model-00001.safetensors.znn"
    rewrite_index_json(str(d), add_suffix=False)
    with open(d / "model.safetensors.index.json") as f:
        assert json.load(f)["weight_map"]["a"] == "model-00001.safetensors"
