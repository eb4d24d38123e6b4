"""Multi-process (multi-host) orchestration tests.

Spawns REAL separate processes wired with ``jax.distributed`` on CPU
(2 processes x 4 virtual devices each — the harness SURVEY.md §4 says the
reference lacks) and asserts the cooperative container is byte-identical
to the single-host engine's.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from zipnn_tpu import ZipNN

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from zipnn_tpu.parallel import multihost

port, pid, nproc, in_path, out_path, dec_path, chunk = sys.argv[1:8]
profile = sys.argv[8] if len(sys.argv) > 8 else "per_chunk"
engine = sys.argv[9] if len(sys.argv) > 9 else "numpy"
multihost.initialize(f"localhost:{port}", int(nproc), int(pid))
assert jax.process_count() == int(nproc)
assert len(jax.devices()) == 4 * int(nproc), jax.devices()
multihost.compress_file_multihost(
    in_path, out_path, bytearray_dtype="bfloat16",
    compression_chunk=int(chunk), engine=engine, huffman_table=profile,
)
multihost.decompress_file_multihost(out_path, dec_path)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _bf16(n_bytes, seed=3):
    rng = np.random.default_rng(seed)
    vals = (rng.standard_normal(n_bytes // 2) * 0.05).astype(np.float32)
    return ((vals.view(np.uint32) >> 16).astype("<u2")).tobytes()[:n_bytes]


@pytest.mark.parametrize("size,engine", [
    (700_000, "numpy"),
    (256 * 1024 * 3, "numpy"),
    (256 * 1024 * 3, "native"),   # per-chunk profile through the C++ core
])
def test_two_process_compress_matches_single_host(tmp_path, size, engine):
    chunk = 128 * 1024
    data = _bf16(size)
    in_path = tmp_path / "weights.bin"
    in_path.write_bytes(data)
    golden = ZipNN(
        engine="numpy", bytearray_dtype="bfloat16", compression_chunk=chunk
    ).compress(data)

    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            PYTHONPATH=str(Path(__file__).resolve().parent.parent),
        )
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, str(script), str(port), str(pid), "2",
                    str(in_path), str(tmp_path / "out.znn"),
                    str(tmp_path / "dec.bin"), str(chunk), "per_chunk", engine,
                ],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
        )
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]

    got = (tmp_path / "out.znn").read_bytes()
    assert got == golden, "multi-process container differs from single-host"
    assert (tmp_path / "dec.bin").read_bytes() == data


@pytest.mark.parametrize("size,chunk,engine", [
    (256 * 1024 * 3, 128 * 1024, "numpy"),   # 6 chunks: legacy exact build
    (1024 * 540 + 333, 1024, "numpy"),       # 541 chunks: SAMPLED + tail
    (1024 * 540 + 333, 1024, "native"),      # native preset-table path
])
def test_two_process_shared_profile_matches_single_host(
    tmp_path, size, chunk, engine
):
    """huffman_table='shared' across 2 real processes: the sampled plane
    histograms are all-reduced, every host builds the identical global
    table, and the container is byte-identical to a single-host shared
    compress — including a rare byte (in process 1's range, absent from
    the global sample) that must store its cell raw on both sides."""
    data = bytearray(_bf16(size, seed=29))
    if size // chunk >= 512:
        data[(size // chunk - 3) * chunk + 11] = 251  # near the end: proc 1
    data = bytes(data)
    in_path = tmp_path / "weights.bin"
    in_path.write_bytes(data)
    golden = ZipNN(
        engine="numpy", bytearray_dtype="bfloat16", compression_chunk=chunk,
        huffman_table="shared",
    ).compress(data)

    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            PYTHONPATH=str(Path(__file__).resolve().parent.parent),
        )
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, str(script), str(port), str(pid), "2",
                    str(in_path), str(tmp_path / "out.znn"),
                    str(tmp_path / "dec.bin"), str(chunk), "shared", engine,
                ],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
        )
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]

    got = (tmp_path / "out.znn").read_bytes()
    assert got == bytes(golden), "shared-profile multihost container differs"
    assert (tmp_path / "dec.bin").read_bytes() == data


def test_single_process_shared_degenerates(tmp_path):
    """n=1 shared-profile path through the same collective code."""
    from zipnn_tpu.parallel import multihost

    chunk = 1024
    data = _bf16(1024 * 520 + 77, seed=31)
    in_path = tmp_path / "w.bin"
    in_path.write_bytes(data)
    multihost.compress_file_multihost(
        str(in_path), str(tmp_path / "o.znn"), bytearray_dtype="bfloat16",
        compression_chunk=chunk, engine="numpy", huffman_table="shared",
    )
    golden = ZipNN(
        engine="numpy", bytearray_dtype="bfloat16", compression_chunk=chunk,
        huffman_table="shared",
    ).compress(data)
    assert (tmp_path / "o.znn").read_bytes() == bytes(golden)
    multihost.decompress_file_multihost(
        str(tmp_path / "o.znn"), str(tmp_path / "d.bin")
    )
    assert (tmp_path / "d.bin").read_bytes() == data


def test_single_process_degenerates(tmp_path):
    """n_processes=1 path (no collectives) still produces the exact
    single-host container through the same code."""
    from zipnn_tpu.parallel import multihost

    chunk = 64 * 1024
    data = _bf16(300_000, seed=11)
    in_path = tmp_path / "w.bin"
    in_path.write_bytes(data)
    multihost.compress_file_multihost(
        str(in_path), str(tmp_path / "o.znn"), bytearray_dtype="bfloat16",
        compression_chunk=chunk, engine="numpy",
    )
    golden = ZipNN(
        engine="numpy", bytearray_dtype="bfloat16", compression_chunk=chunk
    ).compress(data)
    assert (tmp_path / "o.znn").read_bytes() == golden
    multihost.decompress_file_multihost(
        str(tmp_path / "o.znn"), str(tmp_path / "d.bin")
    )
    assert (tmp_path / "d.bin").read_bytes() == data


def test_chunk_range_partition():
    from zipnn_tpu.parallel.multihost import chunk_range

    for n_chunks in (0, 1, 5, 17, 64):
        for n_proc in (1, 2, 3, 8):
            ranges = [chunk_range(p, n_proc, n_chunks) for p in range(n_proc)]
            flat = [c for lo, hi in ranges for c in range(lo, hi)]
            assert flat == list(range(n_chunks))


WORKER_ST = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from zipnn_tpu.parallel import multihost

port, pid, nproc, in_path, out_path, engine = sys.argv[1:7]
profile = sys.argv[7] if len(sys.argv) > 7 else "per_chunk"
multihost.initialize(f"localhost:{port}", int(nproc), int(pid))
multihost.compress_safetensors_multihost(
    in_path, out_path, engine=engine, huffman_table=profile
)
"""

WORKER_TPU_MESH = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from zipnn_tpu import parallel
from zipnn_tpu.parallel import multihost

port, pid, nproc, in_path, out_path, dec_path, chunk = sys.argv[1:8]
multihost.initialize(f"localhost:{port}", int(nproc), int(pid))
with parallel.use_mesh(parallel.make_mesh(jax.local_devices())):
    multihost.compress_file_multihost(
        in_path, out_path, bytearray_dtype="bfloat16",
        compression_chunk=int(chunk), engine="tpu",
    )
    multihost.decompress_file_multihost(out_path, dec_path)
"""


def _run_two(tmp_path, worker_src, args):
    port = _free_port()
    script = tmp_path / "worker2.py"
    script.write_text(worker_src)
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            PYTHONPATH=str(Path(__file__).resolve().parent.parent),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(port), str(pid), "2", *args],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
        )
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]


def _make_st_file(path):
    import torch
    from safetensors.torch import save_file

    g = torch.Generator().manual_seed(5)
    rnd = np.random.default_rng(5)
    tensors = {
        "w.attn": (torch.randn(300, 257, generator=g) * 0.05).to(torch.bfloat16),
        "w.mlp": torch.randn(123, 77, generator=g) * 0.01,
        "ids": torch.arange(1000, dtype=torch.int64),
        # incompressible bf16: exercises the keep-raw-if-bigger rule
        "noise": torch.from_numpy(
            rnd.integers(0, 2**16, (64, 64), dtype=np.uint16).astype(np.uint16)
        ).view(torch.bfloat16),
    }
    save_file(tensors, str(path), metadata={"format": "pt"})
    return tensors


def test_two_process_safetensors_compress(tmp_path):
    """2 processes cooperatively produce ONE .znn.safetensors file that the
    plugins layer loads transparently; byte-identical to the 1-process run
    of the same API (SURVEY.md §2.3 bullet 3)."""
    import torch

    from zipnn_tpu.io.streaming import SafetensorsStreamReader
    from zipnn_tpu.parallel import multihost
    from zipnn_tpu.plugins.safetensors import SafeOpen

    src = tmp_path / "model.safetensors"
    tensors = _make_st_file(src)
    out2 = tmp_path / "model2.znn.safetensors"
    _run_two(tmp_path, WORKER_ST, [str(src), str(out2), "numpy"])

    out1 = tmp_path / "model1.znn.safetensors"
    multihost.compress_safetensors_multihost(str(src), str(out1), engine="numpy")
    assert out1.read_bytes() == out2.read_bytes(), (
        "cooperative output depends on process count"
    )

    rdr = SafetensorsStreamReader(str(out2))
    assert "w.attn" in rdr.compressed and "w.mlp" in rdr.compressed
    assert "ids" not in rdr.compressed and "noise" not in rdr.compressed
    with SafeOpen(str(out2), "pt", "cpu") as f:
        for name, want in tensors.items():
            got = f.get_tensor(name)
            if got.dtype == torch.bfloat16:  # bit-exact (NaN payloads too)
                assert torch.equal(
                    got.view(torch.uint16), want.view(torch.uint16)
                ), name
            else:
                assert torch.equal(got, want), name


def test_two_process_safetensors_shared_profile(tmp_path):
    """Per-tensor shared profile cooperatively: no table collective needed
    (each tensor is compressed whole by one process); output matches the
    1-process run and loads through SafeOpen."""
    import torch

    from zipnn_tpu.parallel import multihost
    from zipnn_tpu.plugins.safetensors import SafeOpen

    src = tmp_path / "model.safetensors"
    tensors = _make_st_file(src)
    out2 = tmp_path / "m2.znn.safetensors"
    _run_two(tmp_path, WORKER_ST, [str(src), str(out2), "numpy", "shared"])
    out1 = tmp_path / "m1.znn.safetensors"
    multihost.compress_safetensors_multihost(
        str(src), str(out1), engine="numpy", huffman_table="shared"
    )
    assert out1.read_bytes() == out2.read_bytes()
    with SafeOpen(str(out2), "pt", "cpu") as f:
        got = f.get_tensor("w.attn")
        assert torch.equal(
            got.view(torch.uint16), tensors["w.attn"].view(torch.uint16)
        )


WORKER_KW = r"""
import json
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from zipnn_tpu.parallel import multihost

port, pid, nproc, in_path, out_path, dec_path, kw_json = sys.argv[1:8]
kw = json.loads(kw_json)
dec_kw = kw.pop("_dec_kw", {})
multihost.initialize(f"localhost:{port}", int(nproc), int(pid))
multihost.compress_file_multihost(in_path, out_path, **kw)
multihost.decompress_file_multihost(out_path, dec_path, **dec_kw)
"""


def _run_two_kw(tmp_path, in_path, out_path, dec_path, kw):
    import json

    port = _free_port()
    script = tmp_path / "worker_kw.py"
    script.write_text(WORKER_KW)
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            PYTHONPATH=str(Path(__file__).resolve().parent.parent),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(port), str(pid), "2",
                 str(in_path), str(out_path), str(dec_path), json.dumps(kw)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
        )
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]


def _mixed_plane_data(n_chunks, chunk, flip_at, seed=0):
    """fp16 data whose low plane flips from incompressible to compressible
    mid-file — the bounded threshold check changes these bytes."""
    rng = np.random.default_rng(seed)
    hi = rng.integers(0, 4, n_chunks * chunk // 2, dtype=np.uint8)
    lo = np.concatenate([
        rng.integers(0, 256, flip_at * chunk // 2, dtype=np.uint8),
        rng.integers(0, 3, (n_chunks - flip_at) * chunk // 2, dtype=np.uint8),
    ])
    data = np.empty(n_chunks * chunk, np.uint8)
    data[0::2] = lo
    data[1::2] = hi
    return data.tobytes()


def test_two_process_bounded_check_partition_invariant(tmp_path):
    """check_th_after_percent across 2 processes: the global prefix [0, K]
    decision is all-reduced, so the container matches a single-host compress
    with the same (default) knob even when the abandonment boundary and the
    process partition boundary disagree."""
    chunk = 4096
    data = _mixed_plane_data(n_chunks=40, chunk=chunk, flip_at=30, seed=9)
    in_path = tmp_path / "w.bin"
    in_path.write_bytes(data)
    z = ZipNN(engine="numpy", bytearray_dtype="float16", compression_chunk=chunk)
    golden = bytes(z.compress(data))
    # sanity: this data actually triggers abandonment
    z0 = ZipNN(
        engine="numpy", bytearray_dtype="float16", compression_chunk=chunk,
        check_th_after_percent=0,
    )
    assert golden != bytes(z0.compress(data))
    _run_two_kw(
        tmp_path, in_path, tmp_path / "o.znn", tmp_path / "d.bin",
        {"bytearray_dtype": "float16", "compression_chunk": chunk,
         "engine": "numpy"},
    )
    assert (tmp_path / "o.znn").read_bytes() == golden
    assert (tmp_path / "d.bin").read_bytes() == data


def test_two_process_streaming(tmp_path):
    """is_streaming=True: frames partitioned across processes; bytes match
    single-host streaming compress; cooperative frame-wise decompress."""
    data = _bf16(1024 * 1024 * 3 + 12345, seed=13)
    in_path = tmp_path / "w.bin"
    in_path.write_bytes(data)
    z = ZipNN(engine="numpy", bytearray_dtype="bfloat16", is_streaming=True,
              streaming_chunk=512 * 1024, compression_chunk=64 * 1024)
    golden = bytes(z.compress(data))
    _run_two_kw(
        tmp_path, in_path, tmp_path / "o.znn", tmp_path / "d.bin",
        {"bytearray_dtype": "bfloat16", "is_streaming": True,
         "streaming_chunk": 512 * 1024, "compression_chunk": 64 * 1024,
         "engine": "numpy"},
    )
    assert (tmp_path / "o.znn").read_bytes() == golden
    assert (tmp_path / "d.bin").read_bytes() == data


def test_two_process_delta_file(tmp_path):
    """delta_second_path: every process XORs its byte range; header delta
    byte and payload match ZipNN(delta_compressed_type='file')."""
    data = _bf16(700_000, seed=17)
    base = _bf16(700_000, seed=18)
    in_path, base_path = tmp_path / "w.bin", tmp_path / "base.bin"
    in_path.write_bytes(data)
    base_path.write_bytes(base)
    z = ZipNN(engine="numpy", bytearray_dtype="bfloat16",
              compression_chunk=64 * 1024, delta_compressed_type="file")
    golden = bytes(z.compress(data, delta_second_data=str(base_path)))
    _run_two_kw(
        tmp_path, in_path, tmp_path / "o.znn", tmp_path / "d.bin",
        {"bytearray_dtype": "bfloat16", "compression_chunk": 64 * 1024,
         "engine": "numpy", "delta_second_path": str(base_path),
         "_dec_kw": {"delta_second_path": str(base_path)}},
    )
    assert (tmp_path / "o.znn").read_bytes() == golden
    assert (tmp_path / "d.bin").read_bytes() == data


def test_multihost_method_byte_matches_zipnn(tmp_path):
    """The multihost header comes from ZipNN._make_header: a non-default
    method knob is recorded identically to the single-host API."""
    from zipnn_tpu.parallel import multihost

    data = _bf16(300_000, seed=19)
    in_path = tmp_path / "w.bin"
    in_path.write_bytes(data)
    golden = bytes(
        ZipNN(engine="numpy", method="HUFFMAN", bytearray_dtype="bfloat16").compress(data)
    )
    multihost.compress_file_multihost(
        str(in_path), str(tmp_path / "o.znn"),
        bytearray_dtype="bfloat16", method="HUFFMAN", engine="numpy",
    )
    assert (tmp_path / "o.znn").read_bytes() == golden


def test_two_process_tpu_engine_with_mesh(tmp_path):
    """The 2-process flow with engine="tpu" and an ambient per-process
    device mesh: the shard_mapped codec stages run inside the cooperative
    compress and the container stays byte-identical to single-host."""
    chunk = 128 * 1024
    data = _bf16(256 * 1024 * 3, seed=21)
    in_path = tmp_path / "weights.bin"
    in_path.write_bytes(data)
    golden = ZipNN(
        engine="numpy", bytearray_dtype="bfloat16", compression_chunk=chunk
    ).compress(data)
    _run_two(
        tmp_path, WORKER_TPU_MESH,
        [str(in_path), str(tmp_path / "o.znn"), str(tmp_path / "d.bin"),
         str(chunk)],
    )
    assert (tmp_path / "o.znn").read_bytes() == golden
    assert (tmp_path / "d.bin").read_bytes() == data
