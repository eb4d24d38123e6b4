"""Multi-host (multi-process) compress/decompress orchestration.

The ``.znn`` format is chunk-parallel by construction, so multi-host scaling
needs no data exchange at all — only *metadata* agreement:

1. every process takes a contiguous, deterministic chunk range of the input
   (:func:`chunk_range`) and reads ONLY its byte range;
2. each compresses its range locally with any single-host engine — the
   local payload's chunk-type/cumulative tables describe its cells;
3. the per-cell types and sizes are all-gathered (the only collective —
   a few bytes per chunk over DCN, the analog of the reference's shared
   -memory cumulative-size table at csrc/zipnn_core.c:105-153);
4. every process then computes the identical global tables and the exact
   byte offset of each of its plane-blob regions, and pwrites them into
   the output file — the container is assembled bit-for-bit *in place*
   with no host ever holding more than its own shard.

Works with any number of processes (including 1, where it degenerates to
the single-host path).  Bootstrap :func:`initialize` wraps
``jax.distributed.initialize`` with env-derived defaults; the 2-process
CPU test (tests/test_multihost.py) drives the whole flow without TPUs.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from .. import codec
from ..core import dtypes
from ..core.header import HEADER_LEN, Header


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent ``jax.distributed.initialize`` with env-var defaults
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)."""
    import jax

    # NB: nothing here may touch the XLA backend (jax.devices,
    # jax.process_count, ...) before distributed.initialize runs
    if getattr(initialize, "_done", False):
        return
    kw = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kw["coordinator_address"] = addr
        kw["num_processes"] = int(
            num_processes or os.environ.get("JAX_NUM_PROCESSES", "1")
        )
        kw["process_id"] = int(
            process_id or os.environ.get("JAX_PROCESS_ID", "0")
        )
    jax.distributed.initialize(**kw)
    initialize._done = True


def chunk_range(process_id: int, n_processes: int, n_chunks: int) -> Tuple[int, int]:
    """Contiguous chunk range [lo, hi) for a process; deterministic and
    balanced (first ``n_chunks % n`` processes take one extra chunk)."""
    base, extra = divmod(n_chunks, n_processes)
    lo = process_id * base + min(process_id, extra)
    hi = lo + base + (1 if process_id < extra else 0)
    return lo, hi


def _allgather_i64(local: np.ndarray) -> np.ndarray:
    """All-gather an int64 array across processes -> [n_processes, ...]."""
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return local[None]
    return np.asarray(
        multihost_utils.process_allgather(local.astype(np.int64), tiled=False)
    )


def _barrier(name: str) -> None:
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() > 1:
        multihost_utils.sync_global_devices(name)


def _make_zipnn(
    bytearray_dtype, method, compression_chunk, threshold, engine, threads,
    huffman_table, check_th_after_percent, is_streaming, streaming_chunk,
    delta_second_path,
):
    from ..zipnn import ZipNN  # noqa: PLC0415

    return ZipNN(
        method=method,
        input_format="byte",
        bytearray_dtype=bytearray_dtype,
        threads=threads,
        compression_threshold=threshold,
        check_th_after_percent=check_th_after_percent,
        compression_chunk=compression_chunk,
        is_streaming=is_streaming,
        streaming_chunk=streaming_chunk,
        delta_compressed_type="file" if delta_second_path else 0,
        engine=engine,
        huffman_table=huffman_table,
    )


def compress_file_multihost(
    in_path: str,
    out_path: str,
    *,
    bytearray_dtype: str = "bfloat16",
    method: str = "AUTO",
    compression_chunk: int = 256 * 1024,
    threshold: float = codec.DEFAULT_THRESHOLD,
    engine: str = "auto",
    threads: int = 0,
    huffman_table: str = "per_chunk",
    check_th_after_percent: int = 10,
    is_streaming: bool = False,
    streaming_chunk: int = 1024 * 1024,
    delta_second_path: Optional[str] = None,
) -> None:
    """Compress ``in_path`` into a single ``.znn`` container cooperatively.

    The knob surface IS ``ZipNN``'s (an instance is constructed internally;
    the container header comes from ``ZipNN._make_header`` so method /
    delta / streaming bytes match the single-host API exactly), and the
    output is byte-identical to a single-host ``ZipNN(...).compress`` of
    the whole file for the same knobs (asserted by tests/test_multihost.py):

    * ``huffman_table="per_chunk"`` (the reference default): chunks are
      fully independent; the bounded threshold check
      (``check_th_after_percent``, codec.check_abandon_index) is made
      partition-invariant by compressing the global prefix ``[0, K]``
      first and all-gathering its per-plane stored sizes — every process
      then derives the identical plane-abandonment decision before
      compressing its remaining chunks;
    * ``huffman_table="shared"`` (the TPU-optimal decode profile): each
      process histograms only its SAMPLED chunks (the format's
      shared_sample_stride policy — global chunk index 0 mod stride),
      one extra collective all-reduces the [num_buf, 256] counts, and
      every host builds the identical global table + hopeless-plane
      flags before encoding its range (codec.shared_tables_from_counts);
    * ``is_streaming=True``: independent frames (one per
      ``streaming_chunk``) are partitioned across processes, each frame
      compressed whole by one process via ``ZipNN._compress_one``, frame
      sizes all-gathered, and every process pwrites its frames in place;
    * ``delta_second_path``: file-delta mode — every process XORs its
      byte range against the same range of the delta file before
      compressing (and the header delta byte is set), matching
      ``ZipNN(delta_compressed_type="file").compress(data, path)``.
    """
    import jax

    pid, n_proc = jax.process_index(), jax.process_count()
    z = _make_zipnn(
        bytearray_dtype, method, compression_chunk, threshold, engine,
        threads, huffman_table, check_th_after_percent, is_streaming,
        streaming_chunk, delta_second_path,
    )
    info = dtypes.from_any(bytearray_dtype)
    grp = dtypes.grouping_for_code(info.code)
    num_buf, byte_reorder, bit_reorder = (
        grp.num_buf, grp.byte_reorder, grp.bit_reorder
    )
    total = os.path.getsize(in_path)
    if delta_second_path is not None and os.path.getsize(delta_second_path) != total:
        raise ValueError(
            "Length of delta file has to match the length of the original file."
        )

    if is_streaming:
        _compress_streaming_multihost(z, in_path, out_path, total, delta_second_path)
        return

    chunk = codec.effective_chunk(compression_chunk, num_buf)
    n_chunks = codec.num_chunks_for(total, chunk)
    lo, hi = chunk_range(pid, n_proc, n_chunks)
    max_local = -(-n_chunks // n_proc) if n_proc else n_chunks

    # ---- local read (contiguous chunk range only) -------------------------
    local_n = hi - lo
    data = np.zeros(0, dtype=np.uint8)
    if local_n:
        with open(in_path, "rb") as f:
            f.seek(lo * chunk)
            data = np.frombuffer(
                f.read(min(hi * chunk, total) - lo * chunk), dtype=np.uint8
            )
        if delta_second_path is not None:
            with open(delta_second_path, "rb") as f:
                f.seek(lo * chunk)
                d = np.frombuffer(f.read(data.size), dtype=np.uint8)
            data = np.bitwise_xor(data, d)

    shared_tables = huffman_table == "shared"
    preset = None
    if shared_tables:
        # the shared-profile collective: all-reduce the sampled per-plane
        # histograms (num_buf x 256 ints over DCN) so every process
        # builds the identical global table — bytes then match a
        # single-host shared compress exactly
        stride = codec.shared_sample_stride(n_chunks)
        local_counts = codec.sampled_plane_counts(
            data, num_buf, bit_reorder, byte_reorder, chunk,
            global_chunk0=lo, stride=stride,
        )
        gcounts = _allgather_i64(local_counts).sum(axis=0)
        preset = codec.shared_tables_from_counts(gcounts, threshold, stride)

    # ---- bounded threshold check, distributed form ------------------------
    # compress the global prefix [0, K] first (owned by the leading
    # process(es)), all-reduce its per-plane stored sizes, and derive the
    # identical abandonment decision everywhere; remaining chunks are then
    # compressed with the abandoned planes forced raw — exactly the
    # single-host codec.check_abandon_index semantics.
    check_idx = (
        None if shared_tables
        else codec.check_abandon_index(n_chunks, check_th_after_percent)
    )
    segments = []  # (payload, seg_n_chunks) in chunk order for [lo, hi)
    raw_planes = None
    if check_idx is not None:
        plo, phi = lo, min(hi, check_idx + 1)
        prefix_stat = np.zeros((num_buf, 2), dtype=np.int64)  # stored, uncomp
        if phi > plo:
            seg = data[: (phi - plo) * chunk]
            payload0 = codec.compress_payload(
                seg, num_buf, bit_reorder, byte_reorder, chunk,
                threshold=threshold, threads=threads, engine=engine,
            )
            segments.append((payload0, phi - plo))
            _, pstarts, _ = codec.parse_tables(payload0, num_buf, phi - plo)
            prefix_stat[:, 0] = pstarts[:, -1]
            prefix_stat[:, 1] = (phi - plo) * (chunk // num_buf)
        gstat = _allgather_i64(prefix_stat).sum(axis=0)
        raw_planes = codec.check_abandon_planes(
            gstat[:, 0], gstat[:, 1], threshold
        )
        lo_rest = max(lo, check_idx + 1)
        if hi > lo_rest:
            seg = data[(lo_rest - lo) * chunk :]
            payload1 = codec.compress_payload(
                seg, num_buf, bit_reorder, byte_reorder, chunk,
                threshold=threshold, threads=threads, engine=engine,
                raw_planes=raw_planes,
            )
            segments.append((payload1, hi - lo_rest))
    elif local_n:
        payload = codec.compress_payload(
            data, num_buf, bit_reorder, byte_reorder, chunk,
            threshold=threshold, threads=threads, engine=engine,
            shared_tables=shared_tables, preset_shared=preset,
        )
        segments.append((payload, local_n))

    # concatenate the segments' cell tables + per-plane blob views
    ltypes = np.zeros((num_buf, local_n), np.uint8)
    lsizes = np.zeros((num_buf, local_n), np.int64)
    plane_blobs = [[] for _ in range(num_buf)]  # memoryviews, in order
    at = 0
    for payload, seg_n in segments:
        st, ss, sdata = codec.parse_tables(payload, num_buf, seg_n)
        ltypes[:, at : at + seg_n] = st
        lsizes[:, at : at + seg_n] = ss[:, 1:] - ss[:, :-1]
        mv = memoryview(payload)
        base = sdata
        for b in range(num_buf):
            plane_blobs[b].append(mv[base : base + int(ss[b, seg_n])])
            base += int(ss[b, seg_n])
        at += seg_n

    # ---- collective: types+sizes, padded to a common width ---------------
    packed = np.full((2, num_buf, max_local), -1, dtype=np.int64)
    packed[0, :, :local_n] = ltypes
    packed[1, :, :local_n] = lsizes
    world = _allgather_i64(packed)  # [n_proc, 2, num_buf, max_local]

    types = np.zeros((num_buf, n_chunks), dtype=np.uint8)
    sizes = np.zeros((num_buf, n_chunks), dtype=np.uint64)
    for p in range(n_proc):
        plo, phi = chunk_range(p, n_proc, n_chunks)
        types[:, plo:phi] = world[p, 0, :, : phi - plo]
        sizes[:, plo:phi] = world[p, 1, :, : phi - plo]

    cumulative = np.cumsum(sizes, axis=1, dtype=np.uint64)
    plane_totals = cumulative[:, -1].astype(np.int64) if n_chunks else np.zeros(num_buf, np.int64)
    plane_base = np.zeros(num_buf, dtype=np.int64)
    for b in range(1, num_buf):
        plane_base[b] = plane_base[b - 1] + plane_totals[b - 1]
    tables = types.tobytes() + cumulative.astype("<u8").tobytes()
    data_start = HEADER_LEN + len(tables)
    total_len = data_start + int(plane_totals.sum())

    # ---- in-place assembly: each process pwrites its plane regions -------
    if pid == 0:
        # the exact single-host header: ZipNN._make_header + the same
        # dtype/grouping/length fields _compress_one fills
        hdr = z._make_header()
        hdr.byte_reorder = byte_reorder
        hdr.bit_reorder = bit_reorder
        hdr.dtype_code = info.code
        hdr.original_len = total
        hdr.total_len = total_len
        with open(out_path, "wb") as f:
            f.truncate(total_len)
            f.write(hdr.to_bytes() + tables)
    _barrier("znn-mh-header")

    if local_n:
        starts_g = np.zeros((num_buf, n_chunks + 1), dtype=np.int64)
        starts_g[:, 1:] = cumulative
        with open(out_path, "r+b") as f:
            for b in range(num_buf):
                f.seek(data_start + int(plane_base[b]) + int(starts_g[b, lo]))
                for blob in plane_blobs[b]:
                    f.write(blob)
    _barrier("znn-mh-data")


def _compress_streaming_multihost(
    z, in_path: str, out_path: str, total: int, delta_second_path: Optional[str]
) -> None:
    """Streaming-mode cooperative compress: frames (independent containers,
    one per ``streaming_chunk`` — reference zipnn.py:612-635) are
    partitioned across processes; each is compressed whole by one process
    via ``ZipNN._compress_one`` so bytes match single-host streaming
    compress exactly; frame byte sizes are all-gathered and every process
    pwrites its frames at the derived offsets."""
    import jax

    pid, n_proc = jax.process_index(), jax.process_count()
    sc = z.streaming_chunk
    n_frames = codec.num_chunks_for(total, sc)
    lo, hi = chunk_range(pid, n_proc, n_frames)
    max_local = -(-n_frames // n_proc) if n_proc else n_frames

    blobs = []
    local_sizes = np.full(max_local, -1, dtype=np.int64)
    if hi > lo:
        with open(in_path, "rb") as f:
            f.seek(lo * sc)
            raw = f.read(min(hi * sc, total) - lo * sc)
        if delta_second_path is not None:
            with open(delta_second_path, "rb") as f:
                f.seek(lo * sc)
                d = f.read(len(raw))
            raw = np.bitwise_xor(
                np.frombuffer(raw, np.uint8), np.frombuffer(d, np.uint8)
            ).tobytes()
        for i in range(hi - lo):
            piece = raw[i * sc : min((i + 1) * sc, len(raw))]
            blob = z._compress_one(piece)
            blobs.append(blob)
            local_sizes[i] = len(blob)

    world = _allgather_i64(local_sizes)  # [n_proc, max_local]
    frame_sizes = np.zeros(n_frames, dtype=np.int64)
    for p in range(n_proc):
        plo, phi = chunk_range(p, n_proc, n_frames)
        frame_sizes[plo:phi] = world[p, : phi - plo]
    offsets = np.zeros(n_frames + 1, dtype=np.int64)
    np.cumsum(frame_sizes, out=offsets[1:])

    if pid == 0:
        with open(out_path, "wb") as f:
            f.truncate(int(offsets[-1]))
    _barrier("znn-mh-sheader")
    if hi > lo:
        with open(out_path, "r+b") as f:
            for i, blob in enumerate(blobs):
                f.seek(int(offsets[lo + i]))
                f.write(blob)
    _barrier("znn-mh-sdata")


def compress_safetensors_multihost(
    in_path: str,
    out_path: str,
    *,
    engine: str = "auto",
    method: str = "HUFFMAN",
    huffman_table: str = "per_chunk",
) -> None:
    """Per-tensor compress a safetensors file cooperatively into ONE
    ``.znn.safetensors`` output (SURVEY.md §2.3 bullet 3).

    Tensors are partitioned across processes by
    :func:`zipnn_tpu.io.streaming.partition_names` (deterministic
    size-balanced bins, no communication); each process range-reads and
    compresses only its shard (``engine`` selects numpy/native/tpu), the
    output byte sizes + keep-raw flags are all-gathered (2 ints per
    tensor), and every process then computes the identical safetensors
    header — reference ``znn_compressed_vectors`` schema
    (zipnn/util_safetensors.py:9-58), loadable by
    ``plugins.safetensors.SafeOpen`` — and pwrites its tensors' bytes in
    place.  Bytes are independent of the process count for any profile:
    each tensor is compressed whole by exactly one process, so
    ``huffman_table="shared"`` needs no cross-process table agreement
    here (unlike :func:`compress_file_multihost`).
    """
    import json  # noqa: PLC0415

    import jax  # noqa: PLC0415

    from ..io.streaming import _ST_DTYPES, SafetensorsStreamReader  # noqa: PLC0415
    from ..plugins.safetensors import METADATA_KEY  # noqa: PLC0415

    pid, n_proc = jax.process_index(), jax.process_count()
    rdr = SafetensorsStreamReader(in_path)
    names = rdr.keys()  # file order = global output order
    mine = set(rdr.shard_names(n_proc, pid))

    _FLOAT_ST = {"F64", "F32", "F16", "BF16", "F8_E4M3", "F8_E5M2"}
    blobs: dict = {}
    local = np.zeros((len(names), 2), dtype=np.int64)  # [out_nbytes, is_comp]
    for i, name in enumerate(names):
        if name not in mine:
            continue
        raw_n = rdr.nbytes(name)
        st_dtype = rdr._tensors[name]["dtype"]
        comp = None
        if st_dtype in _FLOAT_ST:
            from ..io.streaming import np_to_torch  # noqa: PLC0415

            t = np_to_torch(rdr.get_tensor(name))
            from ..zipnn import ZipNN  # noqa: PLC0415

            blob = ZipNN(
                input_format="torch", method=method, engine=engine,
                huffman_table=huffman_table,
            ).compress(t)
            if blob is not None and len(blob) < raw_n:
                comp = bytes(blob)
        if comp is None:
            local[i] = (raw_n, 0)  # raw bytes pass through untouched
        else:
            blobs[name] = comp
            local[i] = (len(comp), 1)

    world = _allgather_i64(local)  # [n_proc, n_tensors, 2]
    owner = {}
    for p in range(n_proc):
        for name in rdr.shard_names(n_proc, p):
            owner[name] = p
    sizes = np.array(
        [world[owner[n], i] for i, n in enumerate(names)], dtype=np.int64
    ).reshape(len(names), 2)

    # identical header on every process (insertion order = file order)
    infos = {}
    header: dict = {}
    md = dict(rdr.metadata)
    md.pop(METADATA_KEY, None)
    md.setdefault("format", "pt")
    off = 0
    for i, name in enumerate(names):
        nbytes, is_comp = int(sizes[i, 0]), int(sizes[i, 1])
        info = rdr._tensors[name]
        if is_comp:
            infos[name] = {
                "dtype": _ST_DTYPES[info["dtype"]][0],
                "shape": str(list(info["shape"])),
            }
            header[name] = {
                "dtype": "U8", "shape": [nbytes],
                "data_offsets": [off, off + nbytes],
            }
        else:
            header[name] = {
                "dtype": info["dtype"], "shape": list(info["shape"]),
                "data_offsets": [off, off + nbytes],
            }
        off += nbytes
    md[METADATA_KEY] = json.dumps(infos)
    hdr_obj = {"__metadata__": md}
    hdr_obj.update(header)
    hjson = json.dumps(hdr_obj, separators=(",", ":")).encode()
    hjson += b" " * ((-(8 + len(hjson))) % 8)  # align the data region
    data_start = 8 + len(hjson)

    if pid == 0:
        with open(out_path, "wb") as f:
            f.truncate(data_start + off)
            f.write(len(hjson).to_bytes(8, "little") + hjson)
    _barrier("znn-mh-st-header")

    offsets = {n: header[n]["data_offsets"][0] for n in names}
    with open(out_path, "r+b") as f:
        for name in names:
            if name not in mine:
                continue
            payload = blobs.get(name)
            if payload is None:
                payload = rdr.read_bytes(name)
            f.seek(data_start + offsets[name])
            f.write(payload)
    _barrier("znn-mh-st-data")


def decompress_file_multihost(
    in_path: str, out_path: str, *, delta_second_path: Optional[str] = None
) -> None:
    """Decompress a ``.znn`` container cooperatively: every process handles
    its chunk range's cells and pwrites the plaintext range.

    Streaming containers (concatenated independent frames) are partitioned
    by frame: a cheap header walk indexes every frame's byte span + output
    offset, then each process decompresses its frames whole.  With
    ``delta_second_path`` the plaintext is XORed against the same byte
    range of the delta file before writing (file-delta decompress parity
    with ``ZipNN.decompress``)."""
    import jax

    pid, n_proc = jax.process_index(), jax.process_count()
    with open(in_path, "rb") as f:
        head = f.read(HEADER_LEN)
        if len(head) == 0:
            if pid == 0:
                open(out_path, "wb").close()
            _barrier("znn-mh-dempty")
            return
        if len(head) >= 14 and head[13] > 127:
            f.seek(0)
            _decompress_streaming_multihost(f, out_path, delta_second_path)
            return
        hdr, _ = Header.from_bytes(head, formats_with_shape=())
        num_buf = dtypes.groups_for_decompress(hdr.dtype_code)
        chunk = codec.effective_chunk(hdr.compression_chunk, num_buf)
        n_chunks = codec.num_chunks_for(hdr.original_len, chunk)
        t_len = num_buf * n_chunks
        tables = f.read(t_len + t_len * 8)
        types = np.frombuffer(tables[:t_len], np.uint8).reshape(num_buf, n_chunks)
        cumulative = (
            np.frombuffer(tables[t_len:], "<u8")
            .reshape(num_buf, n_chunks)
            .astype(np.int64)
        )
        starts = np.zeros((num_buf, n_chunks + 1), dtype=np.int64)
        starts[:, 1:] = cumulative
        plane_base = np.zeros(num_buf, dtype=np.int64)
        for b in range(1, num_buf):
            plane_base[b] = plane_base[b - 1] + starts[b - 1, n_chunks]
        data_start = HEADER_LEN + t_len + t_len * 8

        lo, hi = chunk_range(pid, n_proc, n_chunks)
        local_n = hi - lo
        if pid == 0:
            with open(out_path, "wb") as fo:
                fo.truncate(hdr.original_len)
        _barrier("znn-mh-dheader")
        if local_n:
            # rebuild a LOCAL payload (tables for [lo, hi) + its blobs) and
            # reuse the single-host engine on it
            ltypes = types[:, lo:hi]
            lsizes = (starts[:, lo + 1 : hi + 1] - starts[:, lo:hi]).astype(np.uint64)
            lcum = np.cumsum(lsizes, axis=1, dtype=np.uint64)
            parts = [ltypes.tobytes(), lcum.astype("<u8").tobytes()]
            for b in range(num_buf):
                f.seek(data_start + int(plane_base[b]) + int(starts[b, lo]))
                parts.append(f.read(int(starts[b, hi] - starts[b, lo])))
            local_payload = b"".join(parts)
            local_len = min(hi * chunk, hdr.original_len) - lo * chunk
            out = codec.decompress_payload(
                local_payload, num_buf, hdr.bit_reorder, hdr.byte_reorder,
                chunk, local_len,
            )
            out = np.ascontiguousarray(out)
            if delta_second_path is not None:
                with open(delta_second_path, "rb") as fd:
                    fd.seek(lo * chunk)
                    d = np.frombuffer(fd.read(out.size), dtype=np.uint8)
                out = np.bitwise_xor(out, d)
            with open(out_path, "r+b") as fo:
                fo.seek(lo * chunk)
                fo.write(out.tobytes())
    _barrier("znn-mh-ddata")


def _decompress_streaming_multihost(
    f, out_path: str, delta_second_path: Optional[str]
) -> None:
    """Frame-partitioned cooperative decompress of a streaming container."""
    import jax

    from ..zipnn import ZipNN  # noqa: PLC0415

    pid, n_proc = jax.process_index(), jax.process_count()
    # frame index: (input offset, input len, output offset) via header hops
    frames = []
    in_off = out_off = 0
    f.seek(0, os.SEEK_END)
    file_len = f.tell()
    while in_off < file_len:
        f.seek(in_off)
        head = f.read(HEADER_LEN)
        if len(head) < HEADER_LEN or head[:2] != b"ZN":
            raise ValueError("Header should start with ZN")
        total = int.from_bytes(head[24:32], "little")
        if not 0 < total <= file_len - in_off:
            total = file_len - in_off
        orig = int.from_bytes(head[16:24], "little")
        frames.append((in_off, total, out_off))
        in_off += total
        out_off += orig

    lo, hi = chunk_range(pid, n_proc, len(frames))
    if pid == 0:
        with open(out_path, "wb") as fo:
            fo.truncate(out_off)
    _barrier("znn-mh-dsheader")
    if hi > lo:
        z = ZipNN(input_format="byte")
        with open(out_path, "r+b") as fo:
            for i in range(lo, hi):
                foff, flen, ooff = frames[i]
                f.seek(foff)
                piece = z.decompress_bin(memoryview(f.read(flen)))
                piece = np.frombuffer(piece, dtype=np.uint8)
                if delta_second_path is not None:
                    with open(delta_second_path, "rb") as fd:
                        fd.seek(ooff)
                        d = np.frombuffer(fd.read(piece.size), dtype=np.uint8)
                    piece = np.bitwise_xor(piece, d)
                fo.seek(ooff)
                fo.write(piece.tobytes())
    _barrier("znn-mh-dsdata")
