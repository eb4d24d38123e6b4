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


def compress_file_multihost(
    in_path: str,
    out_path: str,
    *,
    bytearray_dtype: str = "bfloat16",
    compression_chunk: int = 256 * 1024,
    threshold: float = codec.DEFAULT_THRESHOLD,
    engine: str = "auto",
    threads: int = 0,
    huffman_table: str = "per_chunk",
) -> None:
    """Compress ``in_path`` into a single ``.znn`` container cooperatively.

    Every process reads and compresses only its chunk range; process 0
    additionally writes the header + global tables.  The output is
    byte-identical to a single-host ``ZipNN(...).compress`` of the whole
    file (asserted by tests/test_multihost.py) for BOTH profiles:

    * ``huffman_table="per_chunk"`` (the reference default): chunks are
      fully independent, nothing to agree on;
    * ``huffman_table="shared"`` (the TPU-optimal decode profile): each
      process histograms only its SAMPLED chunks (the format's
      shared_sample_stride policy — global chunk index 0 mod stride),
      one extra collective all-reduces the [num_buf, 256] counts, and
      every host builds the identical global table + hopeless-plane
      flags before encoding its range (codec.shared_tables_from_counts).
    """
    import jax

    pid, n_proc = jax.process_index(), jax.process_count()
    info = dtypes.from_any(bytearray_dtype)
    grp = dtypes.grouping_for_code(info.code)
    num_buf, byte_reorder, bit_reorder = (
        grp.num_buf, grp.byte_reorder, grp.bit_reorder
    )
    chunk = codec.effective_chunk(compression_chunk, num_buf)
    total = os.path.getsize(in_path)
    n_chunks = codec.num_chunks_for(total, chunk)
    lo, hi = chunk_range(pid, n_proc, n_chunks)
    max_local = -(-n_chunks // n_proc) if n_proc else n_chunks

    # ---- local compress (contiguous chunk range -> local payload) --------
    local_n = hi - lo
    data = np.zeros(0, dtype=np.uint8)
    if local_n:
        with open(in_path, "rb") as f:
            f.seek(lo * chunk)
            data = np.frombuffer(
                f.read(min(hi * chunk, total) - lo * chunk), dtype=np.uint8
            )

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

    if local_n:
        payload = codec.compress_payload(
            data, num_buf, bit_reorder, byte_reorder, chunk,
            threshold=threshold, threads=threads, engine=engine,
            shared_tables=shared_tables, preset_shared=preset,
        )
        ltypes, lstarts, ldata_start = codec.parse_tables(
            payload, num_buf, local_n
        )
        lsizes = (lstarts[:, 1:] - lstarts[:, :-1]).astype(np.int64)
    else:
        payload = b""
        ltypes = np.zeros((num_buf, 0), np.uint8)
        lstarts = np.zeros((num_buf, 1), np.int64)
        lsizes = np.zeros((num_buf, 0), np.int64)
        ldata_start = 0

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
        hdr = Header(
            byte_reorder=byte_reorder, bit_reorder=bit_reorder, method=0,
            input_format=1, compression_chunk=compression_chunk,
            dtype_code=info.code, original_len=total, total_len=total_len,
        )  # method 0 = AUTO, matching ZipNN's default header byte
        with open(out_path, "wb") as f:
            f.truncate(total_len)
            f.write(hdr.to_bytes() + tables)
    _barrier("znn-mh-header")

    if local_n:
        starts_g = np.zeros((num_buf, n_chunks + 1), dtype=np.int64)
        starts_g[:, 1:] = cumulative
        mv = memoryview(payload)
        with open(out_path, "r+b") as f:
            for b in range(num_buf):
                src_lo = ldata_start + int(
                    sum(lstarts[bb, local_n] for bb in range(b))
                )
                blob = mv[src_lo : src_lo + int(lstarts[b, local_n])]
                f.seek(data_start + int(plane_base[b]) + int(starts_g[b, lo]))
                f.write(blob)
    _barrier("znn-mh-data")


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


def decompress_file_multihost(in_path: str, out_path: str) -> None:
    """Decompress a ``.znn`` container cooperatively: every process handles
    its chunk range's cells and pwrites the plaintext range."""
    import jax

    pid, n_proc = jax.process_index(), jax.process_count()
    with open(in_path, "rb") as f:
        head = f.read(HEADER_LEN)
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
            with open(out_path, "r+b") as fo:
                fo.seek(lo * chunk)
                fo.write(np.ascontiguousarray(out).tobytes())
    _barrier("znn-mh-ddata")
