"""The bounded threshold check (``check_th_after_percent``).

The reference accepts the knob and computes ``K = ceil(numChunks/percent)``
(csrc/zipnn_core.c:423-424) but the action of its check is commented out
(:556-558).  This build honors the intended semantics (spec:
codec.check_abandon_index): after coding chunks [0, K] of a plane, if the
cumulative stored size exceeds threshold x uncompressed, the plane is
abandoned — chunks (K, n) stored raw with no Huffman attempt.  All three
engines must implement it byte-identically.
"""
import numpy as np
import pytest

from zipnn_tpu import ZipNN, codec


def _mixed_plane_data(n_chunks=40, chunk=2048, flip_at=30, seed=0):
    """fp16-grouped data whose low-byte plane is incompressible for the
    first ``flip_at`` chunks and compressible after — the case where the
    bounded check changes bytes."""
    rng = np.random.default_rng(seed)
    hi = rng.integers(0, 4, n_chunks * chunk // 2, dtype=np.uint8)
    lo = np.concatenate([
        rng.integers(0, 256, flip_at * chunk // 2, dtype=np.uint8),
        rng.integers(0, 3, (n_chunks - flip_at) * chunk // 2, dtype=np.uint8),
    ])
    data = np.empty(n_chunks * chunk, np.uint8)
    data[0::2] = lo
    data[1::2] = hi
    return data


def test_check_abandon_index():
    assert codec.check_abandon_index(40, 10) == 4
    assert codec.check_abandon_index(100, 10) == 10
    assert codec.check_abandon_index(101, 10) == 11
    assert codec.check_abandon_index(40, 0) is None      # disabled
    assert codec.check_abandon_index(1, 10) is None      # nothing after K
    assert codec.check_abandon_index(0, 10) is None
    assert codec.check_abandon_index(2, 2) is None       # K == n-1: no-op
    assert codec.check_abandon_index(10, 10) == 1
    assert codec.check_abandon_index(30, 10) == 3


def test_abandonment_changes_bytes_and_roundtrips():
    data = _mixed_plane_data()
    chunk, n_chunks = 2048, 40
    args = (data, 2, 0, 10, chunk)
    p_off = codec.compress_payload_numpy(*args, check_th_after_percent=0)
    p_on = codec.compress_payload_numpy(*args, check_th_after_percent=10)
    assert p_on != p_off
    k = codec.check_abandon_index(n_chunks, 10)
    t_off, _, _ = codec.parse_tables(p_off, 2, n_chunks)
    t_on, _, _ = codec.parse_tables(p_on, 2, n_chunks)
    # prefix identical; abandoned plane raw everywhere after K
    assert np.array_equal(t_on[:, : k + 1], t_off[:, : k + 1])
    abandoned = [b for b in range(2) if t_on[b, n_chunks - 1] == 0 and t_off[b, n_chunks - 1] == 1]
    assert abandoned, "expected an abandoned plane on this data"
    for b in abandoned:
        assert not t_on[b, k + 1 :].any()
    for p in (p_on, p_off):
        out = codec.decompress_payload_numpy(p, 2, 0, 10, chunk, data.size)
        assert np.array_equal(out, data)


@pytest.mark.parametrize("engine", ["native", "tpu"])
def test_engines_byte_identical(engine):
    data = _mixed_plane_data(seed=7)
    chunk = 2048
    golden = codec.compress_payload_numpy(
        data, 2, 0, 10, chunk, check_th_after_percent=10
    )
    got = codec.compress_payload(
        data, 2, 0, 10, chunk, engine=engine, check_th_after_percent=10
    )
    assert bytes(got) == bytes(golden)
    g2 = codec.compress_payload(
        data, 2, 0, 10, chunk, engine=engine, raw_planes=[True, False]
    )
    assert bytes(g2) == bytes(
        codec.compress_payload_numpy(data, 2, 0, 10, chunk, raw_planes=[True, False])
    )


def test_zipnn_passes_knob_through():
    data = _mixed_plane_data(seed=3).tobytes()
    z10 = ZipNN(bytearray_dtype="float16", compression_chunk=2048, engine="numpy")
    z0 = ZipNN(
        bytearray_dtype="float16", compression_chunk=2048, engine="numpy",
        check_th_after_percent=0,
    )
    c10 = bytes(z10.compress(data))
    c0 = bytes(z0.compress(data))
    assert c10 != c0  # default 10 honored (this data triggers abandonment)
    assert bytes(z10.decompress(c10)) == data
    assert bytes(z0.decompress(c0)) == data
    assert len(c10) >= len(c0)  # abandonment trades ratio for speed


def test_ctor_validates():
    with pytest.raises(ValueError):
        ZipNN(check_th_after_percent=-1)
    ZipNN(check_th_after_percent=0)  # 0 disables, accepted


def test_shared_profile_ignores_knob():
    data = _mixed_plane_data(seed=5)
    a = codec.compress_payload_numpy(
        data, 2, 0, 10, 2048, shared_tables=True, check_th_after_percent=10
    )
    b = codec.compress_payload_numpy(
        data, 2, 0, 10, 2048, shared_tables=True, check_th_after_percent=0
    )
    assert a == b
