"""GB-scale real-checkpoint walkthrough (reference
simple_example_granite.py parity).

Downloads one Granite safetensors shard when the network allows (same URL
set as the reference), or synthesizes a 1 GB bf16 checkpoint shard
offline, then measures:

* whole-file compress/decompress throughput + ratio vs zstd,
* bit-exactness of the roundtrip.

Usage: python examples/example_checkpoint.py [--size-mb N] [--engine E]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import time

import numpy as np

from zipnn_tpu import ZipNN

URL = (
    "https://huggingface.co/ibm-granite/granite-3b-code-base/resolve/main/"
    "model-00002-of-00002.safetensors?download=true"
)
LOCAL = "data/granite-3b-code-base.2.bin"


def fetch_or_synthesize(size_mb: int) -> bytes:
    if os.path.exists(LOCAL):
        print(f"using {LOCAL}")
        with open(LOCAL, "rb") as f:
            return f.read()
    try:
        import requests

        print(f"downloading {URL} ...")
        r = requests.get(URL, timeout=30)
        r.raise_for_status()
        os.makedirs("data", exist_ok=True)
        with open(LOCAL, "wb") as f:
            f.write(r.content)
        return r.content
    except Exception as exc:
        print(f"no network ({type(exc).__name__}); synthesizing {size_mb} MB "
              "of bf16-like weights instead")
        rng = np.random.default_rng(0)
        out = []
        for _ in range(size_mb // 64):
            vals = (rng.standard_normal(32 * 1024 * 1024) * 0.02).astype(np.float32)
            out.append(((vals.view(np.uint32) >> 16).astype("<u2")).tobytes())
        return b"".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size-mb", type=int, default=1024)
    ap.add_argument("--engine", default="auto")
    args = ap.parse_args()
    data = fetch_or_synthesize(args.size_mb)
    gb = len(data) / 1e9
    print(f"checkpoint shard: {len(data)} bytes")

    z = ZipNN(bytearray_dtype="bfloat16", engine=args.engine)
    t0 = time.perf_counter()
    comp = z.compress(data)
    t_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    back = ZipNN(engine=args.engine).decompress(comp)
    t_d = time.perf_counter() - t0
    assert bytes(back) == data, "roundtrip mismatch"
    print(
        f"znn     : ratio {len(comp)/len(data):.4f}  "
        f"compress {gb/t_c:.3f} GB/s  decompress {gb/t_d:.3f} GB/s  bit-exact"
    )

    try:
        import zstandard as zstd

        c = zstd.ZstdCompressor(level=3)
        t0 = time.perf_counter()
        zc = c.compress(data)
        t_zc = time.perf_counter() - t0
        d = zstd.ZstdDecompressor()
        t0 = time.perf_counter()
        zd = d.decompress(zc, max_output_size=len(data))
        t_zd = time.perf_counter() - t0
        assert zd == data
        print(
            f"zstd -3 : ratio {len(zc)/len(data):.4f}  "
            f"compress {gb/t_zc:.3f} GB/s  decompress {gb/t_zd:.3f} GB/s"
        )
    except ImportError:
        pass


if __name__ == "__main__":
    main()
