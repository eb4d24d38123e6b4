"""Generate golden ``.znn`` fixtures with canonical-implementation entropy
blocks (python -m tests.make_fixtures).

Each fixture is a complete container assembled exactly the way the
reference library would write it — per-chunk Huffman tables produced by the
*canonical* HUF implementation (tests/ref_huf.py -> libzstd's internal
FiniteStateEntropy code, the library the reference links at
csrc/zipnn_core.c:366), reference chunking/threshold decisions
(zipnn_core.c:364-386), reference chunk-type/cumulative-size tables
(zipnn_core.c:105-153) and the 32-byte header.  Committing these pins the
compatibility claim: every engine must decode bytes it did not produce.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from zipnn_tpu.core import dtypes
from zipnn_tpu.core.header import HEADER_LEN, Header
from zipnn_tpu.ops import byte_group

try:
    from . import ref_huf  # python -m tests.make_fixtures
except ImportError:
    import ref_huf  # pytest rootdir import

FIXDIR = Path(__file__).resolve().parent / "fixtures"
THRESHOLD = 0.95


def ref_payload(
    data: np.ndarray, num_buf: int, bit_reorder: int, byte_reorder: int,
    chunk_size: int,
) -> bytes:
    """Container payload with every cell coded by the canonical library."""
    n = data.size
    n_chunks = (n + chunk_size - 1) // chunk_size
    chunk_types = np.zeros((num_buf, n_chunks), dtype=np.uint8)
    chunk_sizes = np.zeros((num_buf, n_chunks), dtype=np.uint64)
    blobs = [[] for _ in range(num_buf)]
    for c in range(n_chunks):
        chunk = data[c * chunk_size : min((c + 1) * chunk_size, n)]
        planes = byte_group.split(chunk, num_buf, byte_reorder, bit_reorder)
        for b in range(num_buf):
            plane = planes[b]
            comp = ref_huf.ref_compress(plane.tobytes()) if plane.size else None
            if comp is not None and len(comp) < plane.size * THRESHOLD:
                chunk_types[b, c] = 1
                chunk_sizes[b, c] = len(comp)
                blobs[b].append(comp)
            else:
                chunk_types[b, c] = 0
                chunk_sizes[b, c] = plane.size
                blobs[b].append(plane.tobytes())
    cumulative = np.cumsum(chunk_sizes, axis=1, dtype=np.uint64)
    parts = [chunk_types.tobytes(), cumulative.astype("<u8").tobytes()]
    for b in range(num_buf):
        parts.extend(blobs[b])
    return b"".join(parts)


def make_container(
    data: np.ndarray, dtype_name: str, num_buf: int, bit_reorder: int,
    byte_reorder: int, chunk_size: int,
) -> bytes:
    payload = ref_payload(data, num_buf, bit_reorder, byte_reorder, chunk_size)
    hdr = Header(
        byte_reorder=byte_reorder,
        bit_reorder=bit_reorder,
        method=1,  # HUFFMAN
        input_format=1,  # BYTE
        compression_chunk=chunk_size,
        dtype_code=dtypes.from_any(dtype_name).code,
        original_len=data.size,
    )
    hdr.total_len = HEADER_LEN + len(payload)
    return hdr.to_bytes() + payload


def bf16_like(rng, n_elems: int, scale=0.05) -> np.ndarray:
    vals = (rng.standard_normal(n_elems) * scale).astype(np.float32)
    return (
        (vals.view(np.uint32) >> 16).astype("<u2").view(np.uint8).copy()
    )


def main() -> None:
    assert ref_huf.tool_path() is not None, "toolchain/libzstd.a unavailable"
    FIXDIR.mkdir(exist_ok=True)
    rng = np.random.default_rng(1234)
    specs = []

    # default reference profile: bf16, 256 KB chunks, 2 full chunks + tail
    data = bf16_like(rng, 300_000)
    specs.append(("bf16_gauss", data, "bfloat16", 2, 1, 10, 256 * 1024))

    # fp32 4-plane mode 220, 128 KB chunks
    vals = (rng.standard_normal(80_000) * 0.1).astype("<f4")
    specs.append(
        ("fp32_gauss", vals.view(np.uint8).copy(), "float32", 4, 1, 220, 128 * 1024)
    )

    # fp8 single plane at the 128 KB HUF cap
    e4m3 = np.clip(rng.normal(90, 10, 300_000), 0, 255).astype(np.uint8)
    specs.append(("fp8_gauss", e4m3, "float8_e4m3fn", 1, 0, 10, 128 * 1024))

    # mixed: constant region (RLE cells), random region (raw planes),
    # fp16 (no sign rotation), 64 KB chunks
    const = np.zeros(80_000, np.uint8)
    rand = rng.integers(0, 256, 80_000, dtype=np.uint8)
    gauss = bf16_like(rng, 40_000)
    mixed = np.concatenate([const, rand, gauss])
    specs.append(("fp16_mixed", mixed, "float16", 2, 0, 10, 64 * 1024))

    meta = {}
    for name, raw, dtype_name, nb, bit_r, byte_r, chunk in specs:
        comp = make_container(raw, dtype_name, nb, bit_r, byte_r, chunk)
        (FIXDIR / f"{name}.znn").write_bytes(comp)
        (FIXDIR / f"{name}.raw").write_bytes(raw.tobytes())
        meta[name] = {
            "dtype": dtype_name,
            "orig_size": int(raw.size),
            "comp_size": len(comp),
            "chunk": chunk,
        }
        print(name, meta[name])
    (FIXDIR / "fixtures.json").write_text(json.dumps(meta, indent=1))


if __name__ == "__main__":
    main()
