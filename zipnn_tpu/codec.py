"""Chunked byte-group + entropy container codec.

This is the equivalent of the reference C core (csrc/zipnn_core.c): it turns
a flat byte buffer into the ``.znn`` payload

```
[chunk-type table  uint8  [num_buf][num_chunks]]   0 = raw, 1 = Huffman
[cumulative sizes  uint64 [num_buf][num_chunks]]   per-plane running totals
[plane 0 compressed chunks ‖ plane 1 ‖ ...]        chunk order within plane
```

and back.  Layout per zipnn_core.c:105-153 (writer) and :927-1028 (reader);
cumulative sizes are little-endian 64-bit (the reference writes native
``size_t`` and is only ever built little-endian).

Engines:

* ``numpy``  — pure-Python/numpy golden model (this module).
* ``native`` — multithreaded C++ core (zipnn_tpu.native), used when built.
* ``tpu``    — JAX/Pallas device pipeline (zipnn_tpu.ops.jax_codec).

All engines produce byte-identical containers and are cross-validated in
tests/.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .errors import CorruptChunkError
from .ops import byte_group
from .ops.entropy import huf

DEFAULT_THRESHOLD = 0.95
HUF_CAP = 128 * 1024  # HUF block limit; planes larger than this store raw

# Shared-table profile: table-build sampling (format policy, all engines).
# At >= 512 chunks the plane's Huffman table is built from every 8th
# chunk's plane only, and a plane whose sampled expected code length
# cannot beat the threshold is skipped wholesale ("hopeless": every cell
# raw, RLE still applies).  Below 512 chunks behavior is the legacy exact
# build, so small-container bytes are unchanged.  Rationale: at GB scale
# the table from a 1/8 chunk sample is statistically identical, and the
# device encoder then never needs full per-stream histograms (PERF.md).
SHARED_SAMPLE_MIN_CHUNKS = 512
SHARED_SAMPLE_STRIDE = 8


def shared_sample_stride(n_chunks: int) -> int:
    """Chunk stride for the shared-table histogram (1 = every chunk)."""
    return SHARED_SAMPLE_STRIDE if n_chunks >= SHARED_SAMPLE_MIN_CHUNKS else 1


def shared_plane_hopeless(
    count: np.ndarray, lengths: np.ndarray, threshold: float
) -> bool:
    """Plane-level skip rule, applied only when sampling is active.

    True when the sampled expected code length >= 8 * threshold bits per
    symbol — such a plane cannot produce cells that beat the threshold.
    All engines evaluate the identical IEEE-double expression so the
    decision (and therefore the container bytes) is engine-independent.
    """
    c = count.astype(np.int64)
    bits = float(int((c * lengths.astype(np.int64)).sum()))
    total = float(int(c.sum()))
    return bits >= threshold * 8.0 * total


def check_abandon_index(n_chunks: int, check_th_after_percent: int) -> Optional[int]:
    """Chunk index K at which the bounded threshold check runs (per-chunk
    profile only).

    The reference accepts ``check_th_after_percent`` and computes
    ``K = ceil(numChunks / percent)`` (csrc/zipnn_core.c:423-424) but the
    action of its check is commented out (:556-558) — the knob is dead
    code there.  This build honors the *intended* semantics: after coding
    chunks ``0..K`` of a plane, if the cumulative stored size exceeds
    ``threshold`` x the cumulative uncompressed size, the plane is
    abandoned — chunks ``K+1..`` are stored raw without attempting
    Huffman.  Byte-level consequence (FORMAT.md): on an abandoned plane,
    later chunks that would individually have beaten the threshold are
    stored raw.  ``0`` disables the check.  Returns None when disabled or
    when the check point is at/after the last chunk (no chunk to abandon).
    """
    if not check_th_after_percent or check_th_after_percent <= 0:
        return None
    k = -(-n_chunks // check_th_after_percent)  # ceil, reference formula
    return k if k < n_chunks - 1 else None


def check_abandon_planes(
    stored: np.ndarray, uncomp: np.ndarray, threshold: float
) -> np.ndarray:
    """Plane-abandonment decision from the prefix cells' stored vs
    uncompressed byte totals ([num_buf] each).  One IEEE-double expression
    shared by every engine (the C++ twin mirrors it exactly) so the
    decision — and therefore the container bytes — is engine-independent.
    """
    return np.asarray(
        [float(int(s)) > float(int(u)) * threshold for s, u in zip(stored, uncomp)],
        dtype=bool,
    )


def effective_chunk(compression_chunk: int, num_buf: int) -> int:
    """fp8 (single-plane) chunks are capped at the 128 KB HUF block limit
    (reference zipnn.py:721)."""
    if num_buf == 1:
        return min(HUF_CAP, compression_chunk)
    return compression_chunk


def num_chunks_for(length: int, chunk_size: int) -> int:
    return (length + chunk_size - 1) // chunk_size


# ---------------------------------------------------------------------------
# compress
# ---------------------------------------------------------------------------

def sampled_plane_counts(
    data: np.ndarray,
    num_buf: int,
    bit_reorder: int,
    byte_reorder: int,
    chunk_size: int,
    global_chunk0: int = 0,
    stride: int = 1,
) -> np.ndarray:
    """Per-plane byte histograms of the SAMPLED chunks in ``data``.

    ``data`` holds chunks whose global indices start at ``global_chunk0``;
    a chunk is sampled when its GLOBAL index is 0 mod ``stride`` (the
    shared-table format policy).  Returns int64 [num_buf, 256].  Multihost
    shared-profile compress all-reduces these across processes to build
    the identical global table on every host (parallel/multihost.py).
    """
    data = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    n = data.size
    n_chunks = num_chunks_for(n, chunk_size)
    nat = _native()
    if nat is not None:
        # C++ twin (split + 8-way histograms per sampled chunk): exact
        # same integers, ~10x the python sweep
        return nat.sampled_counts(
            data, num_buf, bit_reorder, byte_reorder, chunk_size,
            global_chunk0, stride,
        )
    counts = np.zeros((num_buf, 256), dtype=np.int64)
    first = (-global_chunk0) % stride
    for c in range(first, n_chunks, stride):
        chunk = data[c * chunk_size : min((c + 1) * chunk_size, n)]
        planes = byte_group.split(chunk, num_buf, byte_reorder, bit_reorder)
        for b in range(num_buf):
            if planes[b].size:
                counts[b] += np.bincount(planes[b], minlength=256)
    return counts


def shared_tables_from_counts(counts: np.ndarray, threshold: float, stride: int):
    """Build the per-plane shared tables + live flags from global counts.

    The (tables, live) pair is the ``preset_shared`` accepted by the
    compress paths: passing the same counts on every host yields
    byte-identical containers regardless of process count.
    """
    shared, live = [], []
    for count in counts:
        count = count.astype(np.int64)
        t = huf.build_shared_table(count) if count.sum() else None
        alive = t is not None
        if alive and stride > 1:
            alive = not shared_plane_hopeless(count, t[0], threshold)
        shared.append(t)
        live.append(alive)
    return shared, live


def compress_payload_numpy(
    data: np.ndarray,
    num_buf: int,
    bit_reorder: int,
    byte_reorder: int,
    chunk_size: int,
    threshold: float = DEFAULT_THRESHOLD,
    shared_tables: bool = False,
    preset_shared=None,
    check_th_after_percent: int = 0,
    raw_planes=None,
) -> bytes:
    """Compress a flat uint8 buffer into the table+planes payload (no header).

    ``shared_tables=True`` selects the TPU-optimal encode profile: one
    <=8-bit Huffman table per byte plane (built from the plane-global
    histogram) instead of a per-chunk table.  The container stays 100%
    format-standard — identical weight headers are simply repeated per
    block — and becomes eligible for the Pallas lockstep fast decode path
    (ops/pallas_huf.py).  This function is the byte-level specification the
    tpu engine's implementation is tested against.

    ``check_th_after_percent`` (per-chunk profile only): the bounded
    threshold check — see :func:`check_abandon_index`.  The shared profile
    has its own plane-level rule (:func:`shared_plane_hopeless`) and
    ignores the knob.  ``raw_planes`` (per-chunk profile only) forces the
    listed planes raw from chunk 0 — the multihost distributed form of the
    same check, where the abandonment decision arrives via a collective.
    """
    data = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    n = data.size
    n_chunks = num_chunks_for(n, chunk_size)

    chunk_types = np.zeros((num_buf, n_chunks), dtype=np.uint8)
    chunk_sizes = np.zeros((num_buf, n_chunks), dtype=np.uint64)
    plane_blobs: List[List[bytes]] = [[] for _ in range(num_buf)]

    all_planes: List[List[np.ndarray]] = [[] for _ in range(num_buf)]
    for c in range(n_chunks):
        chunk = data[c * chunk_size : min((c + 1) * chunk_size, n)]
        planes = byte_group.split(chunk, num_buf, byte_reorder, bit_reorder)
        for b in range(num_buf):
            all_planes[b].append(planes[b])

    shared = [None] * num_buf
    live = [True] * num_buf
    if shared_tables and preset_shared is not None:
        # externally built tables (e.g. the multihost global-histogram
        # tables): decisions below are identical, so the bytes match a
        # single-host compress that built the same tables
        shared, live = preset_shared
    elif shared_tables:
        stride = shared_sample_stride(n_chunks)
        for b in range(num_buf):
            count = np.zeros(256, dtype=np.int64)
            for c in range(0, n_chunks, stride):
                plane = all_planes[b][c]
                if plane.size:
                    count += np.bincount(plane, minlength=256)
            if count.sum():
                shared[b] = huf.build_shared_table(count)
            if stride > 1:
                live[b] = shared[b] is not None and not shared_plane_hopeless(
                    count, shared[b][0], threshold
                )

    abandoned = np.zeros(num_buf, dtype=bool)
    check_idx = None
    if not shared_tables:
        if raw_planes is not None:
            abandoned = np.asarray(raw_planes, dtype=bool).copy()
        check_idx = check_abandon_index(n_chunks, check_th_after_percent)
    for c in range(n_chunks):
        for b in range(num_buf):
            plane = all_planes[b][c]
            if shared_tables:
                comp = compress_cell_shared(plane, shared[b] if live[b] else None)
            elif abandoned[b]:
                comp = None  # plane abandoned by the bounded check
            else:
                comp = huf.compress(plane)
            if comp is not None and len(comp) < plane.size * threshold:
                chunk_types[b, c] = 1
                chunk_sizes[b, c] = len(comp)
                plane_blobs[b].append(comp)
            else:
                chunk_types[b, c] = 0
                chunk_sizes[b, c] = plane.size
                plane_blobs[b].append(plane.tobytes())
        if c == check_idx:
            stored = chunk_sizes[:, : c + 1].sum(axis=1)
            uncomp = np.asarray(
                [sum(all_planes[b][i].size for i in range(c + 1)) for b in range(num_buf)]
            )
            abandoned |= check_abandon_planes(stored, uncomp, threshold)

    cumulative = np.cumsum(chunk_sizes, axis=1, dtype=np.uint64)
    parts = [chunk_types.tobytes(), cumulative.astype("<u8").tobytes()]
    for b in range(num_buf):
        parts.extend(plane_blobs[b])
    return b"".join(parts)


def compress_cell_shared(plane: np.ndarray, table) -> Optional[bytes]:
    """Per-cell decision for shared-table mode (specification for all
    engines): RLE for single-symbol cells, the shared table otherwise."""
    n = plane.size
    if n == 0:
        return None
    count = np.bincount(plane, minlength=256)
    if int(count.max()) == n:
        return bytes(plane[:1])  # 1-byte RLE block
    if table is None:
        return None
    lengths, vals, header, _ = table
    if int(lengths[plane].min()) == 0:
        # sampled table (shared_sample_stride > 1): the cell contains a
        # byte the sample never saw, so the table has no code for it
        return None
    return huf.compress_with_table(plane, lengths, vals, header)


# ---------------------------------------------------------------------------
# decompress
# ---------------------------------------------------------------------------

def parse_tables(
    payload, num_buf: int, n_chunks: int
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Parse chunk-type + cumulative-size tables.

    Returns (types [num_buf, n_chunks], start_offsets [num_buf, n_chunks+1]
    relative to each plane's data region, data_start offset in payload).
    """
    mv = memoryview(payload)
    t_len = num_buf * n_chunks
    s_len = num_buf * n_chunks * 8
    types = np.frombuffer(mv[:t_len], dtype=np.uint8).reshape(num_buf, n_chunks).copy()
    cumulative = (
        np.frombuffer(mv[t_len : t_len + s_len], dtype="<u8")
        .reshape(num_buf, n_chunks)
        .astype(np.int64)
    )
    starts = np.zeros((num_buf, n_chunks + 1), dtype=np.int64)
    starts[:, 1:] = cumulative
    return types, starts, t_len + s_len


def plane_chunk_lengths(
    orig_size: int, chunk_size: int, num_buf: int, byte_reorder: int
) -> np.ndarray:
    """Uncompressed length of every (plane, chunk) cell, [num_buf, n_chunks].

    Reproduces the reference reader's layout math (zipnn_core.c:914-928,
    1006-1028): full chunks contribute ``chunk_size // num_buf`` per plane,
    and the last chunk's remainder is distributed one byte at a time to the
    leading planes.
    """
    n_chunks = num_chunks_for(orig_size, chunk_size)
    out = np.zeros((num_buf, max(n_chunks, 0)), dtype=np.int64)
    if n_chunks == 0:
        return out
    out[:, :-1] = chunk_size // num_buf
    last = orig_size - chunk_size * (n_chunks - 1)
    out[:, -1] = byte_group.plane_lengths(last, num_buf, byte_reorder)
    return out


def decompress_payload_numpy(
    payload,
    num_buf: int,
    bit_reorder: int,
    byte_reorder: int,
    chunk_size: int,
    orig_size: int,
) -> np.ndarray:
    """Decompress the table+planes payload back to a flat uint8 buffer."""
    n_chunks = num_chunks_for(orig_size, chunk_size)
    out = np.empty(orig_size, dtype=np.uint8)
    if n_chunks == 0:
        return out

    types, starts, data_start = parse_tables(payload, num_buf, n_chunks)
    decomp_lens = plane_chunk_lengths(orig_size, chunk_size, num_buf, byte_reorder)
    mv = memoryview(payload)

    # plane data regions are laid out back to back
    plane_base = np.zeros(num_buf, dtype=np.int64)
    for b in range(1, num_buf):
        plane_base[b] = plane_base[b - 1] + starts[b - 1, n_chunks]

    for c in range(n_chunks):
        chunk_len = min(chunk_size, orig_size - c * chunk_size)
        planes = []
        for b in range(num_buf):
            lo = data_start + plane_base[b] + starts[b, c]
            hi = data_start + plane_base[b] + starts[b, c + 1]
            blob = mv[lo:hi]
            want = int(decomp_lens[b, c])
            if types[b, c] == 0:
                if hi - lo != want:
                    raise CorruptChunkError(
                        f"raw size mismatch: {hi - lo} != {want}", plane=b, chunk=c
                    )
                planes.append(np.frombuffer(blob, dtype=np.uint8))
            elif types[b, c] == 1:
                try:
                    planes.append(huf.decompress(blob, want))
                except ValueError as exc:
                    raise CorruptChunkError(str(exc), plane=b, chunk=c) from exc
            else:
                raise CorruptChunkError(
                    f"unknown chunk type {types[b, c]}", plane=b, chunk=c
                )
        byte_group.combine(
            planes,
            chunk_len,
            num_buf,
            byte_reorder,
            bit_reorder,
            out=out[c * chunk_size : c * chunk_size + chunk_len],
        )
    return out


# ---------------------------------------------------------------------------
# engine dispatch
# ---------------------------------------------------------------------------

_NATIVE = None
_NATIVE_TRIED = False


def _native():
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        try:
            from . import native  # noqa: PLC0415

            _NATIVE = native
        except Exception:
            _NATIVE = None
    return _NATIVE


def resolve_engine(engine: str, shared_tables: bool = False) -> str:
    if engine == "auto":
        return "native" if _native() is not None else "numpy"
    return engine


def compress_payload(
    data: np.ndarray,
    num_buf: int,
    bit_reorder: int,
    byte_reorder: int,
    chunk_size: int,
    threshold: float = DEFAULT_THRESHOLD,
    threads: int = 0,
    engine: str = "auto",
    shared_tables: bool = False,
    prefix_len: int = 0,
    preset_shared=None,
    check_th_after_percent: int = 0,
    raw_planes=None,
):
    """Engine-dispatched payload compress.

    ``prefix_len`` reserves header space at the front of the result (the
    reference C core's python_header convention, zipnn_core.c:105-121);
    with it the return is a uint8 array whose first ``prefix_len`` bytes
    the caller fills — the native engine builds header + payload in one
    buffer with zero join copies.  ``preset_shared`` supplies externally
    built shared tables + live flags (see shared_tables_from_counts);
    engines without preset support fall back to the numpy spec path.
    ``check_th_after_percent`` / ``raw_planes``: the bounded threshold
    check (per-chunk profile only, see check_abandon_index); all engines
    implement identical semantics.
    """
    engine = resolve_engine(engine, shared_tables)
    if engine == "native":
        nat = _native()
        if shared_tables:
            try:
                return nat.compress_payload_shared(
                    data, num_buf, bit_reorder, byte_reorder, chunk_size,
                    threshold, threads, prefix_len=prefix_len,
                    preset=preset_shared,
                )
            except nat.SharedOverflow:
                pass  # numpy fallback below
        else:
            return nat.compress_payload(
                data, num_buf, bit_reorder, byte_reorder, chunk_size,
                threshold, threads, prefix_len=prefix_len,
                check_th_after_percent=check_th_after_percent,
                raw_planes=raw_planes,
            )
    if engine == "tpu":
        from .ops import jax_codec  # noqa: PLC0415

        if shared_tables:
            # fused device pipeline (split + sampled MXU histogram +
            # Pallas lockstep encode + native splice) when eligible:
            # real TPU, no ambient mesh, >= 1 full chunk, seg <= 4096
            plan = jax_codec.plan_fast_encode(
                data, num_buf, bit_reorder, byte_reorder, chunk_size,
                threshold, preset_shared=preset_shared,
            )
            if plan is not None:
                run, words_dev, assemble = plan
                return assemble(*run(words_dev), prefix_len=prefix_len)
            if preset_shared is None:
                # over the single-shot HBM cap: bounded-memory chunk-range
                # batches with a global sampled table
                out = jax_codec.fast_encode_payload_batched(
                    data, num_buf, bit_reorder, byte_reorder, chunk_size,
                    threshold, prefix_len=prefix_len,
                )
                if out is not None:
                    return out
        payload = jax_codec.compress_payload(
            data, num_buf, bit_reorder, byte_reorder, chunk_size, threshold,
            shared_tables=shared_tables, preset_shared=preset_shared,
            check_th_after_percent=check_th_after_percent,
            raw_planes=raw_planes,
        )
    elif engine in ("numpy", "native"):
        payload = compress_payload_numpy(
            data, num_buf, bit_reorder, byte_reorder, chunk_size, threshold,
            shared_tables=shared_tables, preset_shared=preset_shared,
            check_th_after_percent=check_th_after_percent,
            raw_planes=raw_planes,
        )
    else:
        raise ValueError(f"unknown engine {engine!r}")
    if prefix_len == 0:
        return payload
    out = np.empty(prefix_len + len(payload), dtype=np.uint8)
    out[prefix_len:] = np.frombuffer(payload, np.uint8)
    return out


def decompress_payload(
    payload,
    num_buf: int,
    bit_reorder: int,
    byte_reorder: int,
    chunk_size: int,
    orig_size: int,
    threads: int = 0,
    engine: str = "auto",
    to_device: bool = False,
) -> np.ndarray:
    engine = resolve_engine(engine)
    if engine == "numpy":
        return decompress_payload_numpy(
            payload, num_buf, bit_reorder, byte_reorder, chunk_size, orig_size
        )
    if engine == "native":
        try:
            return _native().decompress_payload(
                payload, num_buf, bit_reorder, byte_reorder, chunk_size,
                orig_size, threads
            )
        except RuntimeError as exc:
            # re-run the golden decoder: it raises a located
            # CorruptChunkError naming the exact (plane, chunk)
            decompress_payload_numpy(
                payload, num_buf, bit_reorder, byte_reorder, chunk_size, orig_size
            )
            raise  # inconsistent engines: surface the native error as-is
    if engine == "tpu":
        from .ops import jax_codec  # noqa: PLC0415

        return jax_codec.decompress_payload(
            payload, num_buf, bit_reorder, byte_reorder, chunk_size, orig_size,
            to_device=to_device,
        )
    raise ValueError(f"unknown engine {engine!r}")
