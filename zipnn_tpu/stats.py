"""Structured compression statistics (SURVEY.md §5: the reference only has
ad-hoc prints; this is the real observability layer).

``payload_stats`` introspects a ``.znn`` frame without decompressing it:
per-plane chunk-type histograms (raw / RLE / Huffman), per-plane compressed
sizes, and overall ratio.  ``ZipNN`` records a :class:`CodecStats` for the
last compress/decompress on ``last_stats``.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from .core import dtypes
from .core.header import HEADER_LEN, Header


@dataclass
class CodecStats:
    """One codec operation's worth of numbers."""

    op: str = ""  # "compress" | "decompress"
    original_bytes: int = 0
    compressed_bytes: int = 0
    seconds: float = 0.0
    engine: str = ""
    dtype: str = ""
    chunk_size: int = 0

    @property
    def ratio(self) -> float:
        return self.compressed_bytes / self.original_bytes if self.original_bytes else 0.0

    @property
    def saved_percent(self) -> float:
        return 100.0 * (1.0 - self.ratio)

    @property
    def throughput_GBps(self) -> float:
        return self.original_bytes / self.seconds / 1e9 if self.seconds > 0 else 0.0

    def as_dict(self) -> Dict:
        return {
            "op": self.op,
            "original_bytes": self.original_bytes,
            "compressed_bytes": self.compressed_bytes,
            "ratio": round(self.ratio, 6),
            "saved_percent": round(self.saved_percent, 3),
            "seconds": round(self.seconds, 6),
            "throughput_GBps": round(self.throughput_GBps, 4),
            "engine": self.engine,
            "dtype": self.dtype,
            "chunk_size": self.chunk_size,
        }


@dataclass
class PlaneStats:
    plane: int
    raw_chunks: int = 0
    rle_chunks: int = 0
    huffman_chunks: int = 0
    compressed_bytes: int = 0

    def as_dict(self) -> Dict:
        return {
            "plane": self.plane,
            "raw_chunks": self.raw_chunks,
            "rle_chunks": self.rle_chunks,
            "huffman_chunks": self.huffman_chunks,
            "compressed_bytes": self.compressed_bytes,
        }


def frame_stats(frame) -> Dict:
    """Introspect one ``.znn`` frame: header fields + per-plane histograms.

    Works on any frame the byte-grouped path wrote (vanilla whole-buffer
    frames report header info only).
    """
    from . import codec  # noqa: PLC0415

    hdr, consumed = Header.from_bytes(
        frame, formats_with_shape=(2, 3, 5)
    )
    info = {
        "version": hdr.version,
        "method": hdr.method,
        "input_format": hdr.input_format,
        "dtype_code": hdr.dtype_code,
        "byte_reorder": hdr.byte_reorder,
        "bit_reorder": hdr.bit_reorder,
        "compression_chunk": hdr.compression_chunk,
        "is_streaming_frame": hdr.is_streaming,
        "original_len": hdr.original_len,
        "total_len": hdr.total_len,
        "ratio": hdr.total_len / hdr.original_len if hdr.original_len else 0.0,
        "shape": hdr.shape,
    }
    try:
        num_buf = dtypes.groups_for_decompress(hdr.dtype_code)
    except ValueError:
        return info  # vanilla / non-grouped frame

    chunk = codec.effective_chunk(hdr.compression_chunk, num_buf)
    n_chunks = codec.num_chunks_for(hdr.original_len, chunk)
    if n_chunks == 0:
        return info
    payload = memoryview(frame)[consumed : hdr.total_len or None]
    types, starts, _ = codec.parse_tables(payload, num_buf, n_chunks)
    sizes = starts[:, 1:] - starts[:, :-1]
    planes: List[Dict] = []
    for b in range(num_buf):
        ps = PlaneStats(plane=b)
        ps.raw_chunks = int(np.sum(types[b] == 0))
        ps.rle_chunks = int(np.sum((types[b] == 1) & (sizes[b] == 1)))
        ps.huffman_chunks = int(np.sum(types[b] == 1)) - ps.rle_chunks
        ps.compressed_bytes = int(sizes[b].sum())
        planes.append(ps.as_dict())
    info["planes"] = planes
    return info


# ---------------------------------------------------------------------------
# device tracing (SURVEY.md §5: the reference's profiling is commented-out
# gettimeofday blocks; the TPU build exposes the real profiler)
# ---------------------------------------------------------------------------

from contextlib import contextmanager


@contextmanager
def trace(log_dir: str, label: str = "zipnn"):
    """Capture a ``jax.profiler`` device trace around a codec region.

    Usage::

        with zipnn_tpu.stats.trace("/tmp/znn-trace"):
            znn.decompress(buf)

    View with TensorBoard or Perfetto (trace files land in ``log_dir``).
    Falls back to a no-op when no JAX backend is available.
    """
    try:
        import jax  # noqa: PLC0415

        with jax.profiler.trace(log_dir):
            with jax.profiler.TraceAnnotation(label):
                yield
    except ImportError:  # pragma: no cover - jax is a hard dep in practice
        yield


def file_stats(path_or_bytes) -> Dict:
    """Frame stats for a file path or a bytes-like object (all frames)."""
    if isinstance(path_or_bytes, str):
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    else:
        data = path_or_bytes
    from .core.header import walk_frames  # noqa: PLC0415

    mv = memoryview(data)
    frames = []
    if len(mv) >= HEADER_LEN and mv[13] > 127:  # streaming container
        for offset, total in walk_frames(mv):
            frames.append(frame_stats(mv[offset : offset + total]))
    else:
        frames.append(frame_stats(mv))
    out = {
        "frames": frames,
        "original_len": sum(f["original_len"] for f in frames),
        "total_len": len(data),
    }
    out["ratio"] = out["total_len"] / out["original_len"] if out["original_len"] else 0.0
    return out

def phase(label: str):
    """Annotate one codec phase for ``jax.profiler`` traces.

    The fused pipelines wrap their host-visible phases (plan, dispatch,
    assemble) in these, so a :func:`trace` capture shows named spans
    instead of one opaque block (SURVEY.md §5 tracing mandate; the
    reference's equivalent is commented-out gettimeofday blocks).
    No-ops outside an active profiler capture.
    """
    import jax  # noqa: PLC0415

    return jax.profiler.TraceAnnotation(f"znn:{label}")
