"""Benchmark harness: one JSON line for the driver.

Headline metric: **device-resident decompress throughput** of the Pallas
lockstep fast path — container payload in HBM in, decompressed weights in
HBM out, one fused dispatch.  This is the production shape (a TPU serving
host decompresses checkpoints straight into device memory); host<->device
link speed is excluded because on this rig the tunnel runs at ~30 MB/s,
three orders of magnitude below a real host's DMA path.

``vs_baseline`` is relative to the reference CPU library's single-worker
decompress figure of 1.66 GB/s (README.md:194/201; its 80 GB/s headline is
a 224-core dual-socket Xeon — see BASELINE.md).  Secondary numbers (native
engine, end-to-end through the tunnel, ratio) go to stderr.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zipnn_tpu import ZipNN  # noqa: E402

BASELINE_SINGLE_WORKER_GBPS = 1.66
MB = 1024 * 1024
SIZE = int(os.environ.get("BENCH_MB", "768")) * MB
CHUNK = int(os.environ.get("BENCH_CHUNK", "32768"))  # TPU shared-table profile


def synth_bf16(nbytes: int) -> bytes:
    rng = np.random.default_rng(7)
    vals = (rng.standard_normal(nbytes // 2) * 0.05).astype(np.float32)
    return ((vals.view(np.uint32) >> 16).astype(np.uint16)).tobytes()[:nbytes]


def bench_native(data: bytes, results: dict) -> None:
    try:
        z = ZipNN(engine="native")
        t0 = time.perf_counter()
        comp = z.compress(data)
        t_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        dec = z.decompress(comp)
        t_d = time.perf_counter() - t0
        assert dec == data
        gb = len(data) / 1e9
        results["native"] = {
            "ratio": len(comp) / len(data),
            "compress_GBps": gb / t_c,
            "decompress_GBps": gb / t_d,
        }
    except Exception as exc:
        results["native"] = {"error": str(exc)[:200]}


def bench_tpu_fused_encode(data: bytes, comp: bytes, results: dict) -> None:
    """Device-resident fused compress GB/s (skipped when no TPU present).

    Times the two-device-dispatch pipeline (split + MXU histogram, Pallas
    lockstep encode) with the input resident in HBM; container assembly is
    host-side memcpy and excluded (through this rig's ~30 MB/s tunnel it
    would measure the tunnel, not the machine).  The assembled payload is
    checked byte-identical to the container the host encoder produced.
    """
    try:
        from zipnn_tpu.core.header import HEADER_LEN
        from zipnn_tpu.ops import jax_codec

        arr = np.frombuffer(data, np.uint8)
        plan = jax_codec.plan_fast_encode(arr, 2, 1, 10, CHUNK)
        if plan is None:
            results["tpu_fused_encode"] = {"error": "fast path not eligible"}
            return
        run, words_dev, assemble = plan
        outs = run(words_dev)
        t0 = time.perf_counter()
        payload = assemble(*outs)
        t_asm = time.perf_counter() - t0
        assert payload == bytes(comp[HEADER_LEN:]), "fused encode payload mismatch"
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            outs = run(words_dev)
            # run() host-syncs the exact bit counts; also sync the encoded
            # rows of the first plane that ran the kernel
            for b in range(len(outs[2])):
                if outs[2][b] is not None:
                    _ = np.asarray(outs[2][b].reshape(-1)[:1])
                    break
            best = min(best, time.perf_counter() - t0)
        results["tpu_fused_encode"] = {
            "compress_GBps_hbm": len(data) / 1e9 / best,
            "assemble_s_host": round(t_asm, 2),
        }
    except Exception as exc:
        results["tpu_fused_encode"] = {"error": str(exc)[:300]}


def bench_tpu_fused(data: bytes, comp: bytes, t_c: float, results: dict) -> float:
    """Device-resident fused decode GB/s (0.0 when no TPU present)."""
    try:
        from zipnn_tpu.core.header import HEADER_LEN
        from zipnn_tpu.ops import jax_codec

        ratio = len(comp) / len(data)

        # correctness through the full API (pays tunnel transfers)
        dec = ZipNN(engine="tpu").decompress(comp)
        assert dec == data, "tpu roundtrip mismatch"

        payload = np.frombuffer(comp, np.uint8)[HEADER_LEN:]
        plan = jax_codec.plan_fast_decode(payload, 2, 1, 10, CHUNK, len(data))
        if plan is None:
            results["tpu_fused"] = {"error": "fast path not eligible"}
            return 0.0
        run, dev_args, meta = plan
        for _w in range(2):  # compile + settle (tunnel timing jitters)
            owords, pend = run(*dev_args)
            _ = np.asarray(pend[:1])
        best = float("inf")
        for _i in range(5):
            t0 = time.perf_counter()
            owords, pend = run(*dev_args)
            _ = np.asarray(pend[:1])
            best = min(best, time.perf_counter() - t0)
        value = len(data) / 1e9 / best
        results["tpu_fused"] = {
            "ratio": ratio,
            "decompress_GBps_hbm": value,
            "compress_GBps_host_shared": len(data) / 1e9 / t_c,
            "n_huf_cells": meta["n_huf"],
        }
        return value
    except Exception as exc:
        results["tpu_fused"] = {"error": str(exc)[:300]}
        return 0.0


def _tile_pc_container(data: bytes, n_tiles: int):
    """Per-chunk-profile payload for ``data`` repeated ``n_tiles`` times.

    The host encoder at this profile runs ~0.35 GB/s on this rig's single
    vCPU, so compressing 768 MB directly would dominate the bench run; a
    16 MB prefix is compressed for real and its cells tiled — every cell
    still decodes independently with its own table, so device decode work
    is identical to a fully distinct container.
    """
    from zipnn_tpu import codec
    from zipnn_tpu.core.header import HEADER_LEN

    comp = ZipNN(compression_chunk=PC_CHUNK).compress(data)
    payload = np.frombuffer(comp, np.uint8)[HEADER_LEN:]
    num_buf = 2
    n_chunks = codec.num_chunks_for(len(data), PC_CHUNK)
    types, starts, data_start = codec.parse_tables(payload, num_buf, n_chunks)
    sizes = (starts[:, 1:] - starts[:, :-1]).astype(np.uint64)
    plane_base = np.zeros(num_buf, dtype=np.int64)
    plane_base[1] = starts[0, n_chunks]
    g_types = np.tile(types, (1, n_tiles))
    g_cum = np.cumsum(np.tile(sizes, (1, n_tiles)), axis=1, dtype=np.uint64)
    parts = [g_types.tobytes(), g_cum.astype("<u8").tobytes()]
    for b in range(num_buf):
        lo = data_start + int(plane_base[b])
        region = payload[lo : lo + int(starts[b, n_chunks])].tobytes()
        parts.extend([region] * n_tiles)
    ratio = (len(comp) - HEADER_LEN) / len(data)
    return b"".join(parts), bytes(data) * n_tiles, ratio


def bench_tpu_pc(results: dict) -> float:
    """Per-chunk-table fused decode GB/s — the reference library's DEFAULT
    encode profile (per-chunk HUF tables, 256 KB chunks): what decoding a
    reference-compressed checkpoint on TPU actually costs.  Cells produced
    by our own engine in the same profile (byte-compatible with reference
    output; cross-validated against the canonical implementation in
    tests/test_ref_compat.py)."""
    try:
        from zipnn_tpu.ops import jax_codec

        unit = synth_bf16(min(SIZE, 16 * MB))
        n_tiles = max(1, SIZE // len(unit))
        payload_b, data, ratio = _tile_pc_container(unit, n_tiles)
        payload = np.frombuffer(payload_b, np.uint8)
        t0 = time.perf_counter()
        plan = jax_codec.plan_pc_decode(payload, 2, 1, 10, PC_CHUNK, len(data))
        t_plan = time.perf_counter() - t0
        if plan is None:
            results["tpu_pc"] = {"error": "pc fast path not eligible"}
            return 0.0
        run, dev_args, meta = plan
        owords, pend = run(*dev_args)
        _ = np.asarray(pend[:1])
        host = np.ascontiguousarray(owords).astype("<u4", copy=False)
        assert bytes(host.reshape(-1).view(np.uint8))[: len(data)] == data, (
            "pc decode mismatch"
        )
        best = float("inf")
        for _i in range(5):
            t0 = time.perf_counter()
            owords, pend = run(*dev_args)
            _ = np.asarray(pend[:1])
            best = min(best, time.perf_counter() - t0)
        value = len(data) / 1e9 / best
        results["tpu_pc"] = {
            "ratio": ratio,
            "decompress_GBps_hbm": value,
            "plan_s": round(t_plan, 3),
            "n_huf_cells": meta["n_huf"],
            "tlog_k": meta["tlog_k"],
        }
        return value
    except Exception as exc:
        results["tpu_pc"] = {"error": str(exc)[:300]}
        return 0.0


def synth_fp16(nbytes: int) -> bytes:
    # log-uniform magnitudes spread the fp16 exponent byte to ~7-8
    # bits/symbol — barely-compressible high bytes, the rate12-class shape
    rng = np.random.default_rng(11)
    n = nbytes // 2
    vals = (
        rng.standard_normal(n) * 10.0 ** rng.uniform(-4, 2, n)
    ).astype(np.float16)
    return vals.tobytes()[:nbytes]


def bench_tpu_pc_fp16(results: dict) -> float:
    """fp16 per-chunk decode: the high byte runs at ~7-9 bits/symbol, so
    this exercises the rate12 (worst-case-provisioned) kernel class at
    768 MB — the cost of correctness on high-entropy-but-compressible
    planes."""
    try:
        from zipnn_tpu.ops import jax_codec

        unit8 = np.frombuffer(synth_fp16(min(SIZE, 16 * MB)), np.uint8)
        n_tiles = max(1, SIZE // unit8.size)
        comp = ZipNN(
            compression_chunk=PC_CHUNK, bytearray_dtype="float16"
        ).compress(unit8.tobytes())
        from zipnn_tpu import codec
        from zipnn_tpu.core.header import HEADER_LEN

        payload = np.frombuffer(comp, np.uint8)[HEADER_LEN:]
        n_chunks = codec.num_chunks_for(unit8.size, PC_CHUNK)
        types, starts, data_start = codec.parse_tables(payload, 2, n_chunks)
        sizes = (starts[:, 1:] - starts[:, :-1]).astype(np.uint64)
        plane_base = np.zeros(2, dtype=np.int64)
        plane_base[1] = starts[0, n_chunks]
        g_types = np.tile(types, (1, n_tiles))
        g_cum = np.cumsum(np.tile(sizes, (1, n_tiles)), axis=1, dtype=np.uint64)
        parts = [g_types.tobytes(), g_cum.astype("<u8").tobytes()]
        for b in range(2):
            lo = data_start + int(plane_base[b])
            region = payload[lo : lo + int(starts[b, n_chunks])].tobytes()
            parts.extend([region] * n_tiles)
        big = np.frombuffer(b"".join(parts), np.uint8)
        data = unit8.tobytes() * n_tiles
        plan = jax_codec.plan_pc_decode(big, 2, 0, 10, PC_CHUNK, len(data))
        if plan is None:
            results["tpu_pc_fp16"] = {"error": "not eligible"}
            return 0.0
        run, dev_args, meta = plan
        owords, pend = run(*dev_args)
        _ = np.asarray(pend[:1])
        host = np.ascontiguousarray(owords).astype("<u4", copy=False)
        assert bytes(host.reshape(-1).view(np.uint8))[: len(data)] == data
        best = float("inf")
        for _i in range(4):
            t0 = time.perf_counter()
            owords, pend = run(*dev_args)
            _ = np.asarray(pend[:1])
            best = min(best, time.perf_counter() - t0)
        value = len(data) / 1e9 / best
        results["tpu_pc_fp16"] = {
            "ratio": (len(comp) - HEADER_LEN) / unit8.size,
            "decompress_GBps_hbm": value,
            "rate12": bool(meta["rate12"]),
            "tlog_k": meta["tlog_k"],
        }
        return value
    except Exception as exc:
        results["tpu_pc_fp16"] = {"error": str(exc)[:300]}
        return 0.0


PC_CHUNK = int(os.environ.get("BENCH_PC_CHUNK", str(256 * 1024)))


def main():
    data = synth_bf16(SIZE)
    results = {}

    z = ZipNN(engine="numpy", huffman_table="shared", compression_chunk=CHUNK)
    t0 = time.perf_counter()
    comp = z.compress(data)
    t_c = time.perf_counter() - t0

    tpu_gbps = bench_tpu_fused(data, comp, t_c, results)
    print(f"[bench] tpu_fused: {results['tpu_fused']}", file=sys.stderr)

    pc_gbps = bench_tpu_pc(results)
    print(f"[bench] tpu_pc: {results['tpu_pc']}", file=sys.stderr)

    bench_tpu_pc_fp16(results)
    print(f"[bench] tpu_pc_fp16: {results['tpu_pc_fp16']}", file=sys.stderr)

    # the headline JSON goes out as soon as the decode sections are done so
    # a driver-side time limit during the (informational) encode/native
    # sections cannot lose the round's record
    value = max(tpu_gbps, pc_gbps)
    engine = "tpu_fused" if tpu_gbps >= pc_gbps else "tpu_pc"
    print(f"[bench] headline engine: {engine}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "decompress_GBps",
                "value": round(value, 4),
                "unit": "GB/s",
                "vs_baseline": round(value / BASELINE_SINGLE_WORKER_GBPS, 4),
            }
        ),
        flush=True,
    )

    bench_tpu_fused_encode(data, comp, results)
    print(f"[bench] tpu_fused_encode: {results['tpu_fused_encode']}", file=sys.stderr)

    bench_native(data[: min(SIZE, 64 * MB)], results)
    print(f"[bench] native: {results['native']}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
