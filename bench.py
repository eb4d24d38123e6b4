"""Benchmark harness: one JSON line for the driver.

Headline metric: decompress throughput (GB/s) of the default engine on
synthetic bf16-like model weights, measured end to end (container bytes in,
original bytes out, bit-exactness asserted).  ``vs_baseline`` is relative to
the reference CPU library's single-worker decompress figure of 1.66 GB/s
(README.md:194/201; its 80 GB/s headline is a 224-core dual-socket Xeon —
see BASELINE.md).

Extra detail (per-engine numbers, ratio) goes to stderr.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zipnn_tpu import ZipNN  # noqa: E402

BASELINE_SINGLE_WORKER_GBPS = 1.66
SIZE = int(os.environ.get("BENCH_MB", "256")) * 1024 * 1024


def synth_bf16(nbytes: int) -> bytes:
    rng = np.random.default_rng(7)
    vals = (rng.standard_normal(nbytes // 2) * 0.05).astype(np.float32)
    return ((vals.view(np.uint32) >> 16).astype(np.uint16)).tobytes()[:nbytes]


def timed(fn, *args, reps=3):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    data = synth_bf16(SIZE)
    gb = len(data) / 1e9

    results = {}
    for engine in ("native", "tpu"):
        try:
            # probe the tpu engine on a small slice first; only pay for the
            # full-size run when it is in a competitive throughput range
            probe = data if engine == "native" else data[: 32 * 1024 * 1024]
            z = ZipNN(engine=engine)
            comp, t_c = timed(z.compress, probe, reps=1 if engine == "tpu" else 2)
            dec, t_d = timed(
                ZipNN(engine=engine).decompress, comp, reps=1 if engine == "tpu" else 2
            )
            assert dec == probe, f"{engine}: roundtrip mismatch"
            pgb = len(probe) / 1e9
            if engine == "tpu" and pgb / t_d > 1.0 and len(probe) < len(data):
                comp, t_c = timed(z.compress, data, reps=1)
                dec, t_d = timed(ZipNN(engine=engine).decompress, comp, reps=2)
                assert dec == data, f"{engine}: roundtrip mismatch"
                probe, pgb = data, gb
            results[engine] = {
                "ratio": len(comp) / len(probe),
                "compress_GBps": pgb / t_c,
                "decompress_GBps": pgb / t_d,
            }
        except Exception as exc:  # pragma: no cover - report and continue
            results[engine] = {"error": str(exc)[:200]}
        print(f"[bench] {engine}: {results[engine]}", file=sys.stderr)

    best_engine = max(
        (e for e in results if "decompress_GBps" in results[e]),
        key=lambda e: results[e]["decompress_GBps"],
        default=None,
    )
    if best_engine is None:
        print(json.dumps({"metric": "decompress_GBps", "value": 0.0, "unit": "GB/s", "vs_baseline": 0.0}))
        return 1
    value = results[best_engine]["decompress_GBps"]
    print(f"[bench] headline engine: {best_engine}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "decompress_GBps",
                "value": round(value, 4),
                "unit": "GB/s",
                "vs_baseline": round(value / BASELINE_SINGLE_WORKER_GBPS, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
