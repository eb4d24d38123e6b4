"""ctypes binding for the native C++ host codec (csrc/ztpu_core.cpp).

The shared library is compiled on first use with the system g++ (no
pip/pybind11 dependency) and cached next to the source.  Produces
byte-identical containers to the numpy engine; cross-validated in
tests/test_native.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc", "ztpu_core.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libztpu_core.so")
_LOCK = threading.Lock()
_LIB = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        "-Wall",
        "-o",
        _LIB_PATH,
        _SRC,
    ]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise NativeUnavailable(f"native build failed:\n{res.stderr}")


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SRC):
            raise NativeUnavailable(f"source not found: {_SRC}")
        if (not os.path.exists(_LIB_PATH)) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ztpu_compress.restype = ctypes.c_longlong
        lib.ztpu_compress.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_uint,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_size_t,
            ctypes.c_double,
            ctypes.c_int,
            ctypes.c_int,   # check_th_after_percent (0 = disabled)
            ctypes.c_uint,  # raw_planes_mask
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.ztpu_compress_shared.restype = ctypes.c_longlong
        # = ztpu_compress's signature minus the per-chunk-only bounded-check
        # params, + nullable (preset_lengths, preset_live) pointers before
        # (out, out_cap)
        lib.ztpu_compress_shared.argtypes = (
            list(lib.ztpu_compress.argtypes)[:-4]
            + [ctypes.c_void_p, ctypes.c_void_p]
            + list(lib.ztpu_compress.argtypes)[-2:]
        )
        lib.ztpu_decompress.restype = ctypes.c_longlong
        lib.ztpu_decompress.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_uint,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.c_int,
            ctypes.c_void_p,
        ]
        lib.ztpu_huf_compress.restype = ctypes.c_longlong
        lib.ztpu_huf_compress.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.ztpu_huf_decompress.restype = ctypes.c_longlong
        lib.ztpu_huf_decompress.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.ztpu_parse_dtables.restype = ctypes.c_longlong
        lib.ztpu_parse_dtables.argtypes = [
            ctypes.c_void_p,  # payload
            ctypes.c_void_p,  # offsets i64[n]
            ctypes.c_void_p,  # sizes i64[n]
            ctypes.c_longlong,
            ctypes.c_void_p,  # sym out u8[n*4096]
            ctypes.c_void_p,  # nb out u8[n*4096]
            ctypes.c_void_p,  # tlog out i32[n]
            ctypes.c_int,
        ]
        lib.ztpu_parse_dweights.restype = ctypes.c_longlong
        lib.ztpu_parse_dweights.argtypes = [
            ctypes.c_void_p,  # payload
            ctypes.c_void_p,  # offsets i64[n]
            ctypes.c_void_p,  # sizes i64[n]
            ctypes.c_longlong,
            ctypes.c_void_p,  # weights out u8[n*256]
            ctypes.c_void_p,  # tlog out i32[n]
            ctypes.c_int,
        ]
        lib.ztpu_expand_cells.restype = ctypes.c_longlong
        lib.ztpu_expand_cells.argtypes = [
            ctypes.c_void_p,  # weights u8[n*256]
            ctypes.c_void_p,  # tlogs i32[n]
            ctypes.c_longlong,
            ctypes.c_int,     # tlog_k
            ctypes.c_void_p,  # bounds out i32[n*(tlog_k-1)]
            ctypes.c_void_p,  # pages out u32[n*(2^tlog_k/4)]
            ctypes.c_int,
        ]
        lib.ztpu_splice_plane.restype = ctypes.c_longlong
        lib.ztpu_splice_plane.argtypes = [
            ctypes.c_void_p,   # out payload base
            ctypes.c_void_p,   # starts i64[full] (absolute)
            ctypes.c_void_p,   # kinds u8[full] 0=raw 1=rle 2=huf
            ctypes.c_void_p,   # rle_vals u8[full]
            ctypes.c_void_p,   # raw_idx i32[full] (or None)
            ctypes.c_void_p,   # raw_rows u8[n_raw, raw_stride] (or None)
            ctypes.c_longlong,
            ctypes.c_void_p,   # header u8[hlen]
            ctypes.c_longlong,
            ctypes.c_void_p,   # sbytes u16[full*4]
            ctypes.c_void_p,   # rows u8[full*4, row_stride] (or None)
            ctypes.c_longlong,
            ctypes.c_void_p,   # row_ok u8[full*4] (or None)
            ctypes.c_longlong,  # full
            ctypes.c_longlong,  # plane_bytes
            ctypes.c_int,
        ]
        lib.ztpu_sample_policy.restype = None
        lib.ztpu_sample_policy.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.ztpu_sampled_counts.restype = ctypes.c_longlong
        lib.ztpu_sampled_counts.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_uint,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_size_t,
            ctypes.c_size_t,  # global_chunk0
            ctypes.c_size_t,  # stride
            ctypes.c_void_p,  # out i64[num_buf*256]
        ]
        # the sampling format policy is engine-shared: a drifted constant
        # would silently break cross-engine byte-identity, so fail loudly
        from . import codec as _codec  # noqa: PLC0415

        mc, st = ctypes.c_uint(), ctypes.c_uint()
        lib.ztpu_sample_policy(ctypes.byref(mc), ctypes.byref(st))
        if (mc.value, st.value) != (
            _codec.SHARED_SAMPLE_MIN_CHUNKS, _codec.SHARED_SAMPLE_STRIDE
        ):
            raise RuntimeError(
                "native sampling policy "
                f"({mc.value}, {st.value}) != codec policy "
                f"({_codec.SHARED_SAMPLE_MIN_CHUNKS}, "
                f"{_codec.SHARED_SAMPLE_STRIDE})"
            )
        _LIB = lib
        return lib


# trigger load (and build) at import so `engine="auto"` can probe availability
_load()


def compress_payload(
    data: np.ndarray,
    num_buf: int,
    bit_reorder: int,
    byte_reorder: int,
    chunk_size: int,
    threshold: float,
    threads: int,
    prefix_len: int = 0,
    check_th_after_percent: int = 0,
    raw_planes=None,
):
    """Compress into the table+planes payload.

    ``prefix_len`` reserves that many bytes at the front of the returned
    buffer for the caller's container header — the reference C core's
    python_header convention (zipnn_core.c:105-121): header + payload live
    in ONE buffer, no join copy.  Returns bytes when prefix_len == 0, else
    a uint8 array of prefix_len + payload bytes (prefix uninitialized).
    ``check_th_after_percent`` / ``raw_planes``: the bounded threshold
    check (codec.check_abandon_index semantics, identical in the C++ core).
    """
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    n = data.size
    n_chunks = (n + chunk_size - 1) // chunk_size
    cap = n + n_chunks * num_buf * 9 + 4096 + (n_chunks + 1) * 64
    out = np.empty(prefix_len + cap, dtype=np.uint8)
    mask = 0
    if raw_planes is not None:
        for b, flag in enumerate(raw_planes):
            if flag:
                mask |= 1 << b
    r = lib.ztpu_compress(
        data.ctypes.data,
        n,
        num_buf,
        bit_reorder,
        byte_reorder,
        chunk_size,
        threshold,
        threads or os.cpu_count() or 1,
        int(check_th_after_percent or 0),
        mask,
        out.ctypes.data + prefix_len,
        cap,
    )
    if r < 0:
        raise RuntimeError(f"native compress failed: {r}")
    if prefix_len == 0:
        return out[:r].tobytes()
    return out[: prefix_len + r]


def sampled_counts(
    data: np.ndarray,
    num_buf: int,
    bit_reorder: int,
    byte_reorder: int,
    chunk_size: int,
    global_chunk0: int = 0,
    stride: int = 1,
) -> np.ndarray:
    """Per-plane byte histograms of the SAMPLED chunks (C++ core twin of
    codec.sampled_plane_counts; exact same integer result)."""
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    out = np.zeros((num_buf, 256), dtype=np.int64)
    r = lib.ztpu_sampled_counts(
        data.ctypes.data,
        data.size,
        num_buf,
        bit_reorder,
        byte_reorder,
        chunk_size,
        global_chunk0,
        stride,
        out.ctypes.data,
    )
    if r < 0:
        raise RuntimeError(f"native sampled_counts failed: {r}")
    return out


class SharedOverflow(RuntimeError):
    """A plane histogram exceeded uint32 (input > ~8.5 GB per call); the
    caller falls back to the numpy engine for exact parity."""


def compress_payload_shared(
    data: np.ndarray,
    num_buf: int,
    bit_reorder: int,
    byte_reorder: int,
    chunk_size: int,
    threshold: float,
    threads: int,
    prefix_len: int = 0,
    preset=None,
):
    """Shared-table (TPU-optimal) profile via the C++ core; byte-identical
    to codec.compress_payload_numpy(shared_tables=True).  ``prefix_len``
    as in :func:`compress_payload`.  ``preset`` = externally built
    (tables, live) as produced by codec.shared_tables_from_counts — the
    multihost global-table path; only the code LENGTHS cross the ABI (the
    core rebuilds header/values deterministically, same as the spec)."""
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    n = data.size
    n_chunks = (n + chunk_size - 1) // chunk_size
    cap = n + n_chunks * num_buf * 9 + 4096 + (n_chunks + 1) * 64
    out = np.empty(prefix_len + cap, dtype=np.uint8)
    pl_ptr = live_ptr = None
    if preset is not None:
        tables, live = preset
        pl = np.zeros((num_buf, 256), dtype=np.uint8)
        lv = np.zeros(num_buf, dtype=np.uint8)
        for b in range(num_buf):
            if tables[b] is not None:
                pl[b] = np.asarray(tables[b][0], dtype=np.uint8)[:256]
            lv[b] = 1 if live[b] else 0
        pl = np.ascontiguousarray(pl)
        lv = np.ascontiguousarray(lv)
        pl_ptr, live_ptr = pl.ctypes.data, lv.ctypes.data
    r = lib.ztpu_compress_shared(
        data.ctypes.data,
        n,
        num_buf,
        bit_reorder,
        byte_reorder,
        chunk_size,
        threshold,
        threads or os.cpu_count() or 1,
        pl_ptr,
        live_ptr,
        out.ctypes.data + prefix_len,
        cap,
    )
    if r == -2:
        raise SharedOverflow()
    if r < 0:
        raise RuntimeError(f"native shared compress failed: {r}")
    if prefix_len == 0:
        return out[:r].tobytes()
    return out[: prefix_len + r]


def decompress_payload(
    payload,
    num_buf: int,
    bit_reorder: int,
    byte_reorder: int,
    chunk_size: int,
    orig_size: int,
    threads: int,
) -> np.ndarray:
    lib = _load()
    buf = np.frombuffer(payload, dtype=np.uint8) if not isinstance(payload, np.ndarray) else payload
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    out = np.empty(orig_size, dtype=np.uint8)
    r = lib.ztpu_decompress(
        buf.ctypes.data,
        buf.size,
        num_buf,
        bit_reorder,
        byte_reorder,
        chunk_size,
        orig_size,
        threads or os.cpu_count() or 1,
        out.ctypes.data,
    )
    if r != 0:
        raise RuntimeError(f"native decompress failed: {r}")
    return out


def huf_compress(data: np.ndarray):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    cap = data.size + 4096
    out = np.empty(cap, dtype=np.uint8)
    r = lib.ztpu_huf_compress(data.ctypes.data, data.size, out.ctypes.data, cap)
    if r < 0:
        raise RuntimeError("huf compress error")
    if r == 0:
        return None
    return out[:r].tobytes()


def huf_decompress(data: bytes, dst_size: int) -> np.ndarray:
    lib = _load()
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    out = np.empty(dst_size, dtype=np.uint8)
    r = lib.ztpu_huf_decompress(buf.ctypes.data, buf.size, out.ctypes.data, dst_size)
    if r < 0:
        raise RuntimeError("huf decompress error")
    return out


def parse_dtables(payload, offsets, sizes, threads: int = 0):
    """Batch-parse HUF weight headers into decode tables.

    ``payload`` uint8 array; per-cell header at ``offsets[i]`` with at most
    ``sizes[i]`` bytes.  Returns (sym [n, 4096] uint8, nb [n, 4096] uint8,
    tlogs [n] int32); entries beyond ``1 << tlogs[i]`` are zero.
    """
    lib = _load()
    buf = np.ascontiguousarray(payload, dtype=np.uint8)
    off = np.ascontiguousarray(offsets, dtype=np.int64)
    szs = np.ascontiguousarray(sizes, dtype=np.int64)
    n = off.size
    sym = np.empty((n, 4096), dtype=np.uint8)
    nb = np.empty((n, 4096), dtype=np.uint8)
    tlogs = np.empty(n, dtype=np.int32)
    r = lib.ztpu_parse_dtables(
        buf.ctypes.data, off.ctypes.data, szs.ctypes.data, n,
        sym.ctypes.data, nb.ctypes.data, tlogs.ctypes.data,
        threads or os.cpu_count() or 1,
    )
    if r != 0:
        raise ValueError(f"corrupt HUF weight header (cell {int(-r) - 1})")
    return sym, nb, tlogs


def parse_dweights(payload, offsets, sizes, threads: int = 0):
    """Batch-parse HUF weight headers into per-symbol weights + tableLogs
    (phase 1 of the per-cell decode plan; no table expansion)."""
    lib = _load()
    buf = np.ascontiguousarray(payload, dtype=np.uint8)
    off = np.ascontiguousarray(offsets, dtype=np.int64)
    szs = np.ascontiguousarray(sizes, dtype=np.int64)
    n = off.size
    weights = np.empty((n, 256), dtype=np.uint8)
    tlogs = np.empty(n, dtype=np.int32)
    r = lib.ztpu_parse_dweights(
        buf.ctypes.data, off.ctypes.data, szs.ctypes.data, n,
        weights.ctypes.data, tlogs.ctypes.data,
        threads or os.cpu_count() or 1,
    )
    if r != 0:
        raise ValueError(f"corrupt HUF weight header (cell {int(-r) - 1})")
    return weights, tlogs


def expand_cells(weights, tlogs, tlog_k: int, threads: int = 0):
    """Expand per-cell weights into kernel boundary registers + packed
    symbol pages (phase 2 of the per-cell decode plan).

    Returns (bounds [n, tlog_k-1] int32, pages [n, 2^tlog_k // 4] uint32).
    """
    lib = _load()
    w = np.ascontiguousarray(weights, dtype=np.uint8)
    t = np.ascontiguousarray(tlogs, dtype=np.int32)
    n = t.size
    bounds = np.empty((n, tlog_k - 1), dtype=np.int32)
    pages = np.empty((n, (1 << tlog_k) // 4), dtype=np.uint32)
    r = lib.ztpu_expand_cells(
        w.ctypes.data, t.ctypes.data, n, tlog_k,
        bounds.ctypes.data, pages.ctypes.data,
        threads or os.cpu_count() or 1,
    )
    if r != 0:
        raise ValueError("expand_cells failed")
    return bounds, pages


def splice_plane(
    out: np.ndarray, starts: np.ndarray, kinds: np.ndarray,
    rle_vals: np.ndarray, raw_idx, raw_rows, header: np.ndarray,
    sbytes: np.ndarray, rows, row_ok, full: int, plane_bytes: int,
    threads: int = 0,
) -> None:
    """Splice one plane's cell region of a shared-profile payload (see
    csrc ztpu_splice_plane).  ``rows``/``raw_rows``/``row_ok``/``raw_idx``
    may be None."""
    lib = _load()

    def ptr(a):
        return a.ctypes.data if a is not None else None

    r = lib.ztpu_splice_plane(
        out.ctypes.data, starts.ctypes.data, kinds.ctypes.data,
        rle_vals.ctypes.data, ptr(raw_idx), ptr(raw_rows),
        raw_rows.shape[1] if raw_rows is not None else 0,
        header.ctypes.data, header.size, sbytes.ctypes.data,
        ptr(rows), rows.shape[1] if rows is not None else 0,
        ptr(row_ok), full, plane_bytes,
        threads or os.cpu_count() or 1,
    )
    if r != 0:
        raise RuntimeError("native splice failed")
