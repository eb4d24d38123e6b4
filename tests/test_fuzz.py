"""Seeded randomized fuzzing over the config/data space.

The reference's tests enumerate a fixed matrix (SURVEY.md §4); this sweeps
a random sample of the cross-product every run with a fixed seed, hitting
size/chunk/streaming/dtype corners the matrix misses.  Oracle: bit-exact
roundtrip plus cross-engine container equality.
"""
import numpy as np
import pytest

from zipnn_tpu import ZipNN
from zipnn_tpu.codec import _native

RNG = np.random.default_rng(0xF022)

DTYPES = ["bfloat16", "float16", "float32", "float8_e4m3fn"]
CHUNKS = [2048, 8192, 32768, 262144]


def _payload(n, kind):
    if n == 0:
        return b""
    if kind == "gauss":
        vals = (RNG.standard_normal(n // 2 + 1) * 0.05).astype(np.float32)
        return ((vals.view(np.uint32) >> 16).astype(np.uint16)).tobytes()[:n]
    if kind == "noise":
        return RNG.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == "zeros":
        return bytes(n)
    if kind == "runs":  # long runs with occasional noise
        a = np.repeat(
            RNG.integers(0, 256, max(n // 97 + 1, 1), dtype=np.uint8), 97
        )[:n].copy()
        flips = RNG.integers(0, n, size=max(n // 500, 1))
        a[flips] = RNG.integers(0, 256, flips.size, dtype=np.uint8)
        return a.tobytes()
    raise AssertionError(kind)


@pytest.mark.parametrize("trial", range(40))
def test_fuzz_roundtrip(trial):
    itemsize = {"bfloat16": 2, "float16": 2, "float32": 4, "float8_e4m3fn": 1}
    dtype = DTYPES[int(RNG.integers(len(DTYPES)))]
    chunk = CHUNKS[int(RNG.integers(len(CHUNKS)))]
    kind = ["gauss", "noise", "zeros", "runs"][int(RNG.integers(4))]
    streaming = bool(RNG.integers(2))
    shared = bool(RNG.integers(2))
    # sizes bracketing chunk/stream boundaries, incl. tiny and ragged
    base = int(RNG.choice([0, 1, 7, 1000, chunk - 1, chunk, chunk + 1,
                           4 * chunk + 13, 300_000]))
    n = (base // itemsize[dtype]) * itemsize[dtype]
    data = _payload(n, kind)

    kw = dict(
        bytearray_dtype=dtype,
        compression_chunk=chunk,
        huffman_table="shared" if shared else "per_chunk",
    )
    if streaming:
        kw.update(is_streaming=True, streaming_chunk=2 ** int(RNG.integers(17, 21)))

    comp = ZipNN(engine="numpy", **kw).compress(data)
    back = ZipNN(engine="numpy", **kw).decompress(bytes(comp))
    assert back == data, (dtype, chunk, kind, n, streaming, shared)

    if _native() is not None and not shared:
        comp_n = ZipNN(engine="native", **kw).compress(data)
        assert bytes(comp_n) == bytes(comp), (dtype, chunk, kind, n)
        back_n = ZipNN(engine="native", **kw).decompress(bytes(comp))
        assert back_n == data
