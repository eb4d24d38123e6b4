"""The ``engine="tpu"`` codec pipeline: JAX/XLA device compress/decompress.

Produces/consumes byte-identical ``.znn`` payloads to the numpy and native
engines (cross-checked in tests/test_jax_engine.py), re-architected for TPU:

* **Full chunks only on device.**  A full 256 KB chunk yields byte planes of
  fixed size whose HUF 4-stream segments are all exactly equal, so every
  stream in the model decodes the same symbol count — perfect lockstep for
  :func:`zipnn_tpu.ops.jax_entropy.decode_streams`.  The ragged tail chunk
  (at most one) runs through the numpy golden model on the host.
* **Transforms as lane arithmetic.**  Byte-plane split/combine and sign-bit
  rotation are uint32 shift/mask passes (ops/jax_transforms.py) that XLA
  fuses into single HBM-bandwidth sweeps.
* **Host does only the tiny serial work**: HUF weight-table headers (~100 B
  per 128 KB block) are parsed/built on the host; all per-byte work (the
  other 99.9%) happens on device.

Reference equivalents: csrc/zipnn_core.c:401-596 (compress core) and
:881-1164 (decompress core).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from . import byte_group
from .entropy import huf, fse
from . import jax_entropy, jax_transforms

DEFAULT_THRESHOLD = 0.95
_DTABLE_PAD = 1 << huf.HUF_TABLELOG_MAX  # 4096
_WORD_GRAN = 256  # pad stream rows to multiples of this many uint32 words


def _jnp():
    import jax.numpy as jnp  # noqa: PLC0415 - keep jax import lazy

    return jnp


def _round_words(nbytes: int) -> int:
    words = (nbytes + 3) // 4 + 1  # +1 guard word for the 2-word window
    return ((words + _WORD_GRAN - 1) // _WORD_GRAN) * _WORD_GRAN


def _mesh():
    from ..parallel import get_default_mesh  # noqa: PLC0415

    return get_default_mesh()


def _decode(words2d, bits, tlog, tbl_off, dtable, seg_len, wpr):
    """Decode dispatch: shard_map over the ambient mesh when one is set."""
    mesh = _mesh()
    if mesh is not None:
        from ..parallel import sharded_decode_streams  # noqa: PLC0415

        return sharded_decode_streams(
            mesh, words2d, bits, tlog, tbl_off, dtable, seg_len, wpr
        )
    return jax_entropy.decode_streams(
        words2d.reshape(-1), bits, tlog, tbl_off, dtable,
        seg_len=seg_len, words_per_row=wpr,
    )


def _encode(syms, nb_tbl, val_tbl, cell_off, seg_len, wpr):
    mesh = _mesh()
    if mesh is not None:
        from ..parallel import sharded_encode_streams  # noqa: PLC0415

        return sharded_encode_streams(
            mesh, syms, nb_tbl, val_tbl, cell_off, seg_len, wpr
        )
    return jax_entropy.encode_streams(
        syms, nb_tbl, val_tbl, cell_off, seg_len=seg_len, words_per_row=wpr
    )


def _split(words, num_buf, byte_reorder, bit_reorder):
    mesh = _mesh()
    if mesh is not None:
        from ..parallel import sharded_split  # noqa: PLC0415

        return sharded_split(mesh, words, num_buf, byte_reorder, bit_reorder)
    return jax_transforms.split_device(words, num_buf, byte_reorder, bit_reorder)


def _combine(planes, num_buf, byte_reorder, bit_reorder):
    mesh = _mesh()
    if mesh is not None:
        from ..parallel import sharded_combine  # noqa: PLC0415

        return sharded_combine(mesh, planes, num_buf, byte_reorder, bit_reorder)
    return jax_transforms.combine_device(planes, num_buf, byte_reorder, bit_reorder)


def _histogram(cells):
    mesh = _mesh()
    if mesh is not None:
        from ..parallel import sharded_histogram  # noqa: PLC0415

        return sharded_histogram(mesh, cells)
    return jax_entropy.histogram_cells(cells)


# ---------------------------------------------------------------------------
# decompress
# ---------------------------------------------------------------------------

def decompress_payload(
    payload,
    num_buf: int,
    bit_reorder: int,
    byte_reorder: int,
    chunk_size: int,
    orig_size: int,
) -> np.ndarray:
    """Decompress the table+planes payload to flat bytes (device pipeline)."""
    jnp = _jnp()
    n_chunks = (orig_size + chunk_size - 1) // chunk_size
    out = np.empty(orig_size, dtype=np.uint8)
    if n_chunks == 0:
        return out

    from .. import codec  # noqa: PLC0415 - avoid import cycle

    types, starts, data_start = codec.parse_tables(payload, num_buf, n_chunks)
    mv = memoryview(payload)

    full = n_chunks if orig_size == n_chunks * chunk_size else n_chunks - 1
    plane_bytes = chunk_size // num_buf
    seg = plane_bytes // 4

    plane_base = np.zeros(num_buf, dtype=np.int64)
    for b in range(1, num_buf):
        plane_base[b] = plane_base[b - 1] + starts[b - 1, n_chunks]

    # ---- classify cells, host-parse HUF headers -------------------------
    huf_cells: List[Tuple[int, int]] = []  # (b, c)
    dtables: List[np.ndarray] = []
    stream_blobs: List[bytes] = []
    stream_bits: List[int] = []
    stream_tlog: List[int] = []
    raw_planes = np.empty((full, num_buf, plane_bytes), dtype=np.uint8) if full else None

    for c in range(full):
        for b in range(num_buf):
            lo = int(data_start + plane_base[b] + starts[b, c])
            hi = int(data_start + plane_base[b] + starts[b, c + 1])
            blob = mv[lo:hi]
            if types[b, c] == 0:
                if hi - lo != plane_bytes:
                    raise ValueError(
                        f"raw chunk size mismatch: plane {b} chunk {c}: {hi - lo} != {plane_bytes}"
                    )
                raw_planes[c, b] = np.frombuffer(blob, dtype=np.uint8)
            elif types[b, c] == 1:
                c_size = hi - lo
                if c_size > plane_bytes:
                    raise ValueError("corrupt HUF block (larger than destination)")
                if c_size == plane_bytes:
                    raw_planes[c, b] = np.frombuffer(blob, dtype=np.uint8)
                elif c_size == 1:
                    raw_planes[c, b] = blob[0]
                else:
                    data = bytes(blob)
                    weights, rank_stats, tlog, _, consumed = huf.read_stats(data)
                    sym_t, nb_t = huf.build_dtable(weights, rank_stats, tlog)
                    ent = np.zeros(_DTABLE_PAD, dtype=np.int32)
                    ent[: sym_t.size] = sym_t.astype(np.int32) | (
                        nb_t.astype(np.int32) << 8
                    )
                    rest = data[consumed:]
                    if len(rest) < 6:
                        raise ValueError("corrupt HUF block (missing jump table)")
                    l1 = int.from_bytes(rest[0:2], "little")
                    l2 = int.from_bytes(rest[2:4], "little")
                    l3 = int.from_bytes(rest[4:6], "little")
                    l4 = len(rest) - 6 - l1 - l2 - l3
                    if l4 <= 0:
                        raise ValueError("corrupt HUF block (jump table overruns input)")
                    off = 6
                    for ln in (l1, l2, l3, l4):
                        s = rest[off : off + ln]
                        if not s:
                            raise ValueError("corrupt HUF block (empty stream)")
                        stream_blobs.append(s)
                        stream_bits.append(jax_entropy.sentinel_bits(s))
                        stream_tlog.append(tlog)
                        off += ln
                    huf_cells.append((b, c))
                    dtables.append(ent)
            else:
                raise ValueError(f"unknown chunk type {types[b, c]}")

    # ---- device decode of all full-chunk HUF streams ---------------------
    if full:
        planes_dev = jnp.asarray(raw_planes)
        if huf_cells:
            S = len(stream_blobs)
            wpr = _round_words(max(len(s) for s in stream_blobs))
            words = jax_entropy.pack_streams_np(stream_blobs, wpr)
            n_cells = len(huf_cells)
            tbl_off = np.repeat(np.arange(n_cells, dtype=np.int32) * _DTABLE_PAD, 4)
            syms, bits_left = _decode(
                jnp.asarray(words),
                jnp.asarray(np.asarray(stream_bits, dtype=np.int32)),
                jnp.asarray(np.asarray(stream_tlog, dtype=np.int32)),
                jnp.asarray(tbl_off),
                jnp.asarray(np.concatenate(dtables)),
                seg,
                wpr,
            )
            if np.any(np.asarray(bits_left) != 0):
                raise ValueError("corrupt HUF stream (not fully consumed)")
            huf_planes = syms.reshape(n_cells, plane_bytes)
            idx_c = jnp.asarray(np.asarray([c for _, c in huf_cells], dtype=np.int32))
            idx_b = jnp.asarray(np.asarray([b for b, _ in huf_cells], dtype=np.int32))
            planes_dev = planes_dev.at[idx_c, idx_b].set(huf_planes)

        # bytes -> uint32 words, combine planes, one device->host copy
        pw = planes_dev.reshape(full, num_buf, plane_bytes // 4, 4).astype(jnp.uint32)
        pwords = pw[..., 0] | (pw[..., 1] << 8) | (pw[..., 2] << 16) | (pw[..., 3] << 24)
        owords = _combine(pwords, num_buf, byte_reorder, bit_reorder)
        host = np.asarray(owords).astype("<u4", copy=False)
        out[: full * chunk_size] = host.reshape(-1).view(np.uint8)

    # ---- ragged tail chunk: numpy golden model ---------------------------
    if full < n_chunks:
        c = n_chunks - 1
        chunk_len = orig_size - c * chunk_size
        lens = byte_group.plane_lengths(chunk_len, num_buf, byte_reorder)
        planes = []
        for b in range(num_buf):
            lo = int(data_start + plane_base[b] + starts[b, c])
            hi = int(data_start + plane_base[b] + starts[b, c + 1])
            blob = mv[lo:hi]
            want = int(lens[b])
            if types[b, c] == 0:
                if hi - lo != want:
                    raise ValueError(
                        f"raw chunk size mismatch: plane {b} chunk {c}: {hi - lo} != {want}"
                    )
                planes.append(np.frombuffer(blob, dtype=np.uint8))
            else:
                planes.append(huf.decompress(blob, want))
        byte_group.combine(
            planes, chunk_len, num_buf, byte_reorder, bit_reorder,
            out=out[c * chunk_size : c * chunk_size + chunk_len],
        )
    return out


# ---------------------------------------------------------------------------
# compress
# ---------------------------------------------------------------------------

def _plan_cell(count: np.ndarray, n: int):
    """Host-side per-cell coding plan from the device histogram.

    Reproduces every decision of ops/entropy/huf.py compress() so that the
    tpu engine's chunk-type table is bit-identical to the other engines.
    Returns ('rle', sym) | ('raw',) | ('huf', header, table_log, lengths, vals).
    """
    if n == 0 or n > huf.HUF_BLOCKSIZE_MAX:
        return ("raw",)
    nz = np.nonzero(count)[0]
    max_sv = int(nz[-1])
    largest = int(count.max())
    if largest == n:
        return ("rle", int(nz[0]))
    if largest <= (n >> 7) + 4 or n < 12:
        return ("raw",)
    table_log = fse.optimal_table_log(huf.HUF_TABLELOG_DEFAULT, n, max_sv, minus=1)
    lengths = huf.build_code_lengths(count, table_log)
    if lengths is None:
        return ("raw",)
    table_log = int(lengths.max())
    header = huf.write_ctable(lengths, max_sv, table_log)
    if header is None or len(header) + 12 >= n:
        return ("raw",)
    vals = huf.canonical_values(lengths, table_log)
    return ("huf", header, table_log, lengths, vals)


def compress_payload(
    data: np.ndarray,
    num_buf: int,
    bit_reorder: int,
    byte_reorder: int,
    chunk_size: int,
    threshold: float = DEFAULT_THRESHOLD,
) -> bytes:
    """Compress flat bytes into the table+planes payload (device pipeline)."""
    jnp = _jnp()
    data = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    n = data.size
    n_chunks = (n + chunk_size - 1) // chunk_size
    if n_chunks == 0:
        return codec_empty(num_buf)

    full = n_chunks if n == n_chunks * chunk_size else n_chunks - 1
    plane_bytes = chunk_size // num_buf
    seg = plane_bytes // 4

    chunk_types = np.zeros((num_buf, n_chunks), dtype=np.uint8)
    chunk_sizes = np.zeros((num_buf, n_chunks), dtype=np.uint64)
    blobs: List[List[Optional[bytes]]] = [
        [None] * n_chunks for _ in range(num_buf)
    ]

    plane_host = None
    if full:
        # device: split planes + per-cell histograms
        words = data[: full * chunk_size].view("<u4").reshape(full, chunk_size // 4)
        planes_dev = _split(jnp.asarray(words), num_buf, byte_reorder, bit_reorder)
        # [full, num_buf, plane_words] uint32
        pw = planes_dev
        pbytes = jnp.stack(
            [pw & 0xFF, (pw >> 8) & 0xFF, (pw >> 16) & 0xFF, (pw >> 24) & 0xFF],
            axis=-1,
        ).astype(jnp.uint8).reshape(full, num_buf, plane_bytes)
        hist = np.asarray(
            _histogram(pbytes.reshape(full * num_buf, plane_bytes))
        ).reshape(full, num_buf, 256)

        # host: per-cell coding plan
        plans = [[None] * num_buf for _ in range(full)]
        enc_cells: List[Tuple[int, int]] = []
        for c in range(full):
            for b in range(num_buf):
                plan = _plan_cell(hist[c, b].astype(np.int64), plane_bytes)
                plans[c][b] = plan
                if plan[0] == "huf":
                    enc_cells.append((c, b))

        # device: lockstep-encode the 4 streams of every huf cell
        stream_bytes_out: List[np.ndarray] = []
        if enc_cells:
            n_enc = len(enc_cells)
            nb_tbl = np.zeros((n_enc, 256), dtype=np.uint32)
            val_tbl = np.zeros((n_enc, 256), dtype=np.uint32)
            for i, (c, b) in enumerate(enc_cells):
                _, _, _, lengths, vals = plans[c][b]
                nb_tbl[i] = lengths.astype(np.uint32)
                val_tbl[i] = vals.astype(np.uint32)
            idx_c = jnp.asarray(np.asarray([c for c, _ in enc_cells], dtype=np.int32))
            idx_b = jnp.asarray(np.asarray([b for _, b in enc_cells], dtype=np.int32))
            cell_syms = pbytes[idx_c, idx_b].reshape(n_enc * 4, seg)
            # worst-case bits per stream: 12 bits/symbol + sentinel
            wpr = _round_words((seg * huf.HUF_TABLELOG_MAX + 1 + 7) // 8)
            cell_off = np.repeat(np.arange(n_enc, dtype=np.int32) * 256, 4)
            words_out, total_bits = _encode(
                cell_syms,
                jnp.asarray(nb_tbl.reshape(-1)),
                jnp.asarray(val_tbl.reshape(-1)),
                jnp.asarray(cell_off),
                seg,
                wpr,
            )
            words_host = np.asarray(words_out)
            bits_host = np.asarray(total_bits)
            byte_view = words_host.astype("<u4", copy=False).view(np.uint8).reshape(
                len(cell_syms), -1
            )
            for i in range(len(cell_syms)):
                nbytes = (int(bits_host[i]) + 7) // 8
                stream_bytes_out.append(byte_view[i, :nbytes])

        plane_host = np.asarray(pbytes)  # for raw cells

        # host: assemble per-cell blobs with the exact reference decisions
        si = 0
        for i, (c, b) in enumerate(enc_cells):
            _, header, _, _, _ = plans[c][b]
            streams = stream_bytes_out[si : si + 4]
            si += 4
            ok = all(0 < s.size <= 65535 for s in streams)
            if ok:
                jump = b"".join(int(s.size).to_bytes(2, "little") for s in streams[:3])
                comp = header + jump + b"".join(s.tobytes() for s in streams)
                if len(comp) >= plane_bytes - 1 or len(comp) >= plane_bytes * threshold:
                    comp = None
            else:
                comp = None
            if comp is None:
                plans[c][b] = ("raw",)
            else:
                chunk_types[b, c] = 1
                chunk_sizes[b, c] = len(comp)
                blobs[b][c] = comp

        for c in range(full):
            for b in range(num_buf):
                plan = plans[c][b]
                if plan[0] == "huf":
                    continue  # already assembled
                if plan[0] == "rle":
                    comp = bytes([plan[1]])
                    if len(comp) < plane_bytes * threshold:
                        chunk_types[b, c] = 1
                        chunk_sizes[b, c] = len(comp)
                        blobs[b][c] = comp
                        continue
                chunk_types[b, c] = 0
                chunk_sizes[b, c] = plane_bytes
                blobs[b][c] = plane_host[c, b].tobytes()

    # ragged tail chunk: numpy golden model
    if full < n_chunks:
        c = n_chunks - 1
        chunk = data[c * chunk_size : n]
        planes = byte_group.split(chunk, num_buf, byte_reorder, bit_reorder)
        for b in range(num_buf):
            plane = planes[b]
            comp = huf.compress(plane)
            if comp is not None and len(comp) < plane.size * threshold:
                chunk_types[b, c] = 1
                chunk_sizes[b, c] = len(comp)
                blobs[b][c] = comp
            else:
                chunk_types[b, c] = 0
                chunk_sizes[b, c] = plane.size
                blobs[b][c] = plane.tobytes()

    cumulative = np.cumsum(chunk_sizes, axis=1, dtype=np.uint64)
    parts = [chunk_types.tobytes(), cumulative.astype("<u8").tobytes()]
    for b in range(num_buf):
        parts.extend(bytes(x) if not isinstance(x, bytes) else x for x in blobs[b])
    return b"".join(parts)


def codec_empty(num_buf: int) -> bytes:
    return b""
