"""Observability layer: CodecStats, payload introspection, device tracing."""
import numpy as np

from zipnn_tpu import ZipNN, stats

RNG = np.random.default_rng(11)


def _bf16_bytes(n):
    vals = (RNG.standard_normal(n // 2) * 0.05).astype(np.float32)
    return ((vals.view(np.uint32) >> 16).astype(np.uint16)).tobytes()[:n]


def test_last_stats_records_both_ops():
    data = _bf16_bytes(1 << 20)
    z = ZipNN(engine="numpy")
    comp = z.compress(data)
    s = z.last_stats
    assert s.op == "compress"
    assert s.original_bytes == len(data)
    assert s.compressed_bytes == len(comp)
    assert 0 < s.ratio < 1
    assert s.throughput_GBps > 0
    z.decompress(bytes(comp))
    assert z.last_stats.op == "decompress"


def test_payload_stats_plane_histogram():
    data = _bf16_bytes(1 << 20)
    comp = ZipNN(engine="numpy").compress(data)
    info = stats.frame_stats(bytes(comp))
    assert info["planes"], info
    per_plane = {p["plane"]: p for p in info["planes"]}
    # bf16 LE gaussian weights: plane 0 (mantissa bytes) stays raw,
    # plane 1 (sign-rotated exponent bytes) huffmans
    assert per_plane[1]["huffman_chunks"] > 0
    assert per_plane[0]["raw_chunks"] > 0
    total = sum(p["compressed_bytes"] for p in info["planes"])
    assert 0 < total < len(data)


def test_trace_contextmanager(tmp_path):
    data = _bf16_bytes(1 << 18)
    with stats.trace(str(tmp_path), label="test"):
        ZipNN(engine="numpy").compress(data)
    # jax.profiler writes trace artifacts under the log dir
    assert any(tmp_path.rglob("*")), "no trace output written"
