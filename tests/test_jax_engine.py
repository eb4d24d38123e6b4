"""TPU (JAX) engine: bit-identity against the numpy golden model.

Covers the device transforms, the lockstep entropy kernels, and the full
engine="tpu" payload pipeline, all on the CPU backend (conftest.py pins
JAX_PLATFORMS=cpu with 8 virtual devices).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from zipnn_tpu import codec  # noqa: E402
from zipnn_tpu.ops import byte_group, jax_codec, jax_entropy, jax_transforms  # noqa: E402
from zipnn_tpu.ops.entropy import huf  # noqa: E402

RNG = np.random.default_rng(42)


def _bf16ish(n: int) -> np.ndarray:
    """Byte pattern resembling bf16 weights (compressible exponent plane)."""
    vals = (RNG.standard_normal(n // 2) * 0.05).astype(np.float32)
    u = (vals.view(np.uint32) >> 16).astype(np.uint16)
    return u.view(np.uint8)[:n].copy()


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("num_buf,byte_reorder,bit_reorder", [
    (2, 10, 1), (2, 10, 0), (4, 220, 1), (4, 220, 0), (1, 10, 0),
])
def test_device_split_combine_matches_numpy(num_buf, byte_reorder, bit_reorder):
    chunk = 4096
    data = RNG.integers(0, 256, size=(3 * chunk,), dtype=np.uint8)
    words = jnp.asarray(data.view("<u4").reshape(3, chunk // 4))

    planes_dev = jax_transforms.split_device(words, num_buf, byte_reorder, bit_reorder)
    got = np.asarray(planes_dev).astype("<u4").view(np.uint8).reshape(
        3, num_buf, chunk // num_buf
    )
    for c in range(3):
        want = byte_group.split(
            data[c * chunk : (c + 1) * chunk], num_buf, byte_reorder, bit_reorder
        )
        for b in range(num_buf):
            assert np.array_equal(got[c, b], want[b]), (c, b)

    back = jax_transforms.combine_device(planes_dev, num_buf, byte_reorder, bit_reorder)
    assert np.array_equal(
        np.asarray(back).astype("<u4").view(np.uint8).reshape(-1), data
    )


def test_word_width_bitcasts_little_endian():
    """u32<->u8/u16 lane conversions are little-endian bitcasts: the device
    byte stream must equal numpy's ``tobytes`` regardless of backend (the
    fused decode's as_u8 output and the zipnn fp16 wide-view path both
    rely on this; also run on hardware via test_tpu_word_width_bitcasts)."""
    w_np = RNG.integers(0, 2**32, size=1024, dtype=np.uint32)
    w = jnp.asarray(w_np)
    assert bytes(np.asarray(jax_transforms.u32_flat_to_u8(w))) == w_np.tobytes()
    assert np.array_equal(
        np.asarray(jax_transforms.u32_flat_to_u16(w)), w_np.view("<u2")
    )
    flat = jnp.asarray(w_np.view(np.uint8))
    assert np.array_equal(
        np.asarray(jax_transforms.u8_flat_to_u16(flat)), w_np.view("<u2")
    )


@pytest.mark.tpu
def test_tpu_word_width_bitcasts():
    """Hardware twin of test_word_width_bitcasts_little_endian: XLA:TPU's
    bitcast_convert_type minor-axis byte order must also be little-endian
    (bits [8i, 8i+8) in element i), or every as_u8 fused output would be
    byte-swapped."""
    test_word_width_bitcasts_little_endian()


def test_sign_rotation_matches_numpy():
    data = RNG.integers(0, 256, size=4096, dtype=np.uint8)
    w = jnp.asarray(data.view("<u4"))
    for dev, host in [
        (jax_transforms.reorder_sign_16, byte_group.reorder_sign_16),
        (jax_transforms.revert_sign_16, byte_group.revert_sign_16),
        (jax_transforms.reorder_sign_32, byte_group.reorder_sign_32),
        (jax_transforms.revert_sign_32, byte_group.revert_sign_32),
    ]:
        got = np.asarray(dev(w)).astype("<u4").view(np.uint8)
        assert np.array_equal(got, host(data)), dev.__name__


# ---------------------------------------------------------------------------
# lockstep entropy kernels
# ---------------------------------------------------------------------------

def _huf_block_parts(data: np.ndarray):
    comp = huf.compress(data)
    assert comp is not None and len(comp) > 1
    weights, rank_stats, tlog, _, consumed = huf.read_stats(comp)
    sym_t, nb_t = huf.build_dtable(weights, rank_stats, tlog)
    rest = comp[consumed:]
    l1 = int.from_bytes(rest[0:2], "little")
    l2 = int.from_bytes(rest[2:4], "little")
    l3 = int.from_bytes(rest[4:6], "little")
    l4 = len(rest) - 6 - l1 - l2 - l3
    offs, streams = 6, []
    for ln in (l1, l2, l3, l4):
        streams.append(rest[offs : offs + ln])
        offs += ln
    return comp, streams, sym_t, nb_t, tlog


def test_decode_streams_matches_scalar():
    n = 8192  # seg = 2048, all four segments equal
    data = _bf16ish(2 * n)[1::2][:n].copy()  # exponent-ish plane
    comp, streams, sym_t, nb_t, tlog = _huf_block_parts(data)
    seg = n // 4

    ent = np.zeros(4096, dtype=np.int32)
    ent[: sym_t.size] = sym_t.astype(np.int32) | (nb_t.astype(np.int32) << 8)
    wpr = jax_codec._round_words(max(len(s) for s in streams))
    words = jax_entropy.pack_streams_np(streams, wpr)
    bits = np.asarray([jax_entropy.sentinel_bits(s) for s in streams], dtype=np.int32)

    syms, left = jax_entropy.decode_streams(
        jnp.asarray(words.reshape(-1)),
        jnp.asarray(bits),
        jnp.asarray(np.full(4, tlog, dtype=np.int32)),
        jnp.asarray(np.zeros(4, dtype=np.int32)),
        jnp.asarray(ent),
        seg_len=seg,
        words_per_row=wpr,
    )
    assert np.all(np.asarray(left) == 0)
    got = np.asarray(syms).reshape(-1)
    assert np.array_equal(got, data)


def test_encode_streams_matches_host_encoder():
    n = 4096
    data = _bf16ish(2 * n)[1::2][:n].copy()
    count = np.bincount(data, minlength=256).astype(np.int64)
    plan = jax_codec._plan_cell(count, n)
    assert plan[0] == "huf"
    _, header, tlog, lengths, vals = plan

    seg = n // 4
    syms = jnp.asarray(data.reshape(4, seg))
    wpr = jax_codec._round_words((seg * 12 + 8) // 8)
    words, total_bits = jax_entropy.encode_streams(
        syms,
        jnp.asarray(lengths.astype(np.uint32)),
        jnp.asarray(vals.astype(np.uint32)),
        jnp.asarray(np.zeros(4, dtype=np.int32)),
        seg_len=seg,
        words_per_row=wpr,
    )
    words = np.asarray(words)
    total_bits = np.asarray(total_bits)
    for i in range(4):
        want = huf.encode_stream(data[i * seg : (i + 1) * seg], vals, lengths)
        nbytes = (int(total_bits[i]) + 7) // 8
        got = words[i].astype("<u4").view(np.uint8)[:nbytes]
        assert np.array_equal(got, np.frombuffer(want, dtype=np.uint8)), i


def test_histogram_cells():
    data = RNG.integers(0, 256, size=(5, 1024), dtype=np.uint8)
    got = np.asarray(jax_entropy.histogram_cells(jnp.asarray(data)))
    for c in range(5):
        assert np.array_equal(got[c], np.bincount(data[c], minlength=256))


# ---------------------------------------------------------------------------
# full payload pipeline: engine parity
# ---------------------------------------------------------------------------

CASES = [
    # (num_buf, bit_reorder, byte_reorder, chunk, size)
    (2, 1, 10, 8192, 8192 * 3),        # bf16, exact chunk multiple
    (2, 1, 10, 8192, 8192 * 3 + 1234), # bf16, ragged tail
    (2, 0, 10, 8192, 20000),           # fp16 mode
    (4, 1, 220, 16384, 16384 * 2),     # fp32
    (1, 0, 10, 4096, 4096 * 2 + 17),   # fp8 single plane
]


@pytest.mark.parametrize("num_buf,bit_reorder,byte_reorder,chunk,size", CASES)
def test_tpu_engine_payload_parity(num_buf, bit_reorder, byte_reorder, chunk, size):
    data = _bf16ish(size + (size & 1))[:size].copy()
    want = codec.compress_payload_numpy(
        data, num_buf, bit_reorder, byte_reorder, chunk
    )
    got = jax_codec.compress_payload(
        data, num_buf, bit_reorder, byte_reorder, chunk
    )
    assert got == want

    back = jax_codec.decompress_payload(
        want, num_buf, bit_reorder, byte_reorder, chunk, size
    )
    assert np.array_equal(back, data)


def test_tpu_engine_raw_planes():
    """Incompressible noise: every plane stays raw, parity must still hold."""
    data = RNG.integers(0, 256, size=3 * 8192 + 5, dtype=np.uint8)
    want = codec.compress_payload_numpy(data, 2, 1, 10, 8192)
    got = jax_codec.compress_payload(data, 2, 1, 10, 8192)
    assert got == want
    back = jax_codec.decompress_payload(want, 2, 1, 10, 8192, data.size)
    assert np.array_equal(back, data)


def test_tpu_engine_rle_planes():
    """All-zero data: RLE (1-byte) blocks on both planes."""
    data = np.zeros(2 * 8192, dtype=np.uint8)
    want = codec.compress_payload_numpy(data, 2, 1, 10, 8192)
    got = jax_codec.compress_payload(data, 2, 1, 10, 8192)
    assert got == want
    back = jax_codec.decompress_payload(want, 2, 1, 10, 8192, data.size)
    assert np.array_equal(back, data)


def test_zipnn_api_tpu_engine_roundtrip():
    from zipnn_tpu import ZipNN

    data = _bf16ish(300_000).tobytes()
    z_np = ZipNN(engine="numpy", compression_chunk=65536)
    z_tpu = ZipNN(engine="tpu", compression_chunk=65536)
    c_np = z_np.compress(data)
    c_tpu = z_tpu.compress(data)
    assert bytes(c_np) == bytes(c_tpu)
    assert ZipNN(engine="tpu").decompress(c_np) == data
    assert ZipNN(engine="numpy").decompress(c_tpu) == data


# ---------------------------------------------------------------------------
# shared-table (TPU-optimal) encode profile
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("num_buf,bit_reorder,byte_reorder,chunk,size", [
    (2, 1, 10, 8192, 8192 * 3),
    (2, 1, 10, 8192, 8192 * 2 + 777),
    (4, 1, 220, 16384, 16384 * 2),
    (1, 0, 10, 4096, 4096),
])
def test_shared_tables_payload_parity(num_buf, bit_reorder, byte_reorder, chunk, size):
    data = _bf16ish(size + (size & 1))[:size].copy()
    want = codec.compress_payload_numpy(
        data, num_buf, bit_reorder, byte_reorder, chunk, shared_tables=True
    )
    got = jax_codec.compress_payload(
        data, num_buf, bit_reorder, byte_reorder, chunk, shared_tables=True
    )
    assert got == want
    # decodable by every engine (it is a plain standard container)
    back = codec.decompress_payload_numpy(
        want, num_buf, bit_reorder, byte_reorder, chunk, size
    )
    assert np.array_equal(back, data)
    back2 = jax_codec.decompress_payload(
        want, num_buf, bit_reorder, byte_reorder, chunk, size
    )
    assert np.array_equal(back2, data)


def test_shared_tables_ratio_close_to_per_chunk():
    data = _bf16ish(8192 * 16)
    per_chunk = codec.compress_payload_numpy(data, 2, 1, 10, 8192)
    shared = codec.compress_payload_numpy(data, 2, 1, 10, 8192, shared_tables=True)
    # shared tables trade a little ratio for lockstep decode; stay within 3%
    assert len(shared) < len(per_chunk) * 1.03


def test_shared_tables_zipnn_api():
    from zipnn_tpu import ZipNN

    data = _bf16ish(300_000).tobytes()
    z = ZipNN(engine="numpy", huffman_table="shared", compression_chunk=16384)
    c = z.compress(data)
    # decompressible with the default (per-chunk-capable) configuration
    assert ZipNN(engine="numpy").decompress(c) == data
    assert ZipNN(engine="tpu").decompress(c) == data
    # native engine decodes shared containers too (format is unchanged)
    try:
        d = ZipNN(engine="native").decompress(c)
        assert d == data
    except Exception as exc:  # pragma: no cover
        raise AssertionError(f"native engine must read shared containers: {exc}")


def test_shared_tables_native_roundtrip_identity():
    """Shared-mode compress via engine='auto' (routed to numpy) roundtrips."""
    from zipnn_tpu import ZipNN

    data = _bf16ish(100_000).tobytes()
    z = ZipNN(huffman_table="shared")
    c = z.compress(data)
    assert ZipNN().decompress(c) == data


def test_jax_device_output_roundtrip():
    """input_format='jax' + engine='tpu' returns device arrays end to end."""
    import ml_dtypes
    from zipnn_tpu import ZipNN

    x = (_bf16ish(65536 * 2 + 100)[: 2 * 60000]).view(np.uint16)
    arr = jnp.asarray(x.view(ml_dtypes.bfloat16))
    z = ZipNN(input_format="jax", engine="tpu", compression_chunk=16384)
    c = z.compress(arr)
    back = ZipNN(input_format="jax", engine="tpu").decompress(c)
    assert isinstance(back, jax.Array)
    assert back.dtype == jnp.bfloat16 and back.shape == arr.shape
    assert np.array_equal(np.asarray(back).view(np.uint16), x)


def test_words_to_typed_exact_and_hazards():
    """words_to_typed: exact retyping for clean streams, nonzero hazard
    count for bit patterns TPU float relayouts canonicalize (NaN payloads
    everywhere; denormals for bf16/fp8 — fp16 denormals are exact and must
    NOT count; measured on v5e, jax_transforms width-conversion rules)."""
    import ml_dtypes

    def dw(u16):
        b = u16.view(np.uint8)
        pad = (-b.size) % 512
        buf = np.zeros(b.size + pad, np.uint8)
        buf[: b.size] = b
        return jax_transforms.DeviceWords(jnp.asarray(buf.view("<u4")), b.size)

    clean = ((RNG.integers(100, 160, 4096, np.uint16) << 7)
             | RNG.integers(0, 128, 4096, np.uint16))
    arr, hz = jax_transforms.words_to_typed(dw(clean), 6, (64, 64))
    assert int(hz) == 0 and arr.dtype == jnp.bfloat16 and arr.shape == (64, 64)
    assert np.array_equal(np.asarray(arr).view(np.uint16).reshape(-1), clean)

    denorm = clean.copy()
    denorm[7] = 0x0001  # bf16 denormal
    _arr, hz = jax_transforms.words_to_typed(dw(denorm), 6, (64, 64))
    assert int(hz) == 1
    nanp = clean.copy()
    nanp[9] = 0xFFC5  # bf16 NaN payload
    _arr, hz = jax_transforms.words_to_typed(dw(nanp), 6, (64, 64))
    assert int(hz) == 1

    # fp16: denormals are exact on TPU relayouts -> zero hazards; NaN counts
    f16 = clean.copy()
    f16[3] = 0x0001  # f16 denormal: fine
    arr, hz = jax_transforms.words_to_typed(dw(f16), 4, (4096,))
    assert int(hz) == 0
    assert np.array_equal(np.asarray(arr).view(np.uint16), f16)
    f16[5] = 0x7C01  # f16 NaN payload
    _arr, hz = jax_transforms.words_to_typed(dw(f16), 4, (4096,))
    assert int(hz) == 1

    # fp32 never hazards (exact everywhere, including NaN payloads)
    w32 = np.tile(np.array([0x7FC00001, 0x00000001, 0x3F800000], np.uint32), 128)
    b32 = w32.view(np.uint16)
    arr, hz = jax_transforms.words_to_typed(dw(b32), 1, (384,))
    assert int(hz) == 0
    assert np.array_equal(np.asarray(arr).view(np.uint32), w32)

    # odd geometry -> no device path (caller falls back to host)
    assert jax_transforms.words_to_typed(dw(clean), 6, (4096 // 2, 2, 1)) is None


def test_jax_device_output_hazard_fallback_bit_exact():
    """A bf16 stream containing denormals/NaN payloads must still
    round-trip bit-exactly through input_format='jax' decompress: the
    hazard scan routes it through the exact host marshal (TPU float
    relayouts would flush/canonicalize those patterns)."""
    import ml_dtypes
    from zipnn_tpu import ZipNN

    x = (_bf16ish(2 * 50000)).view(np.uint16).copy()
    x[::97] = 0x0001   # bf16 denormals
    x[5::1013] = 0x7FC5  # NaN payloads
    arr = jnp.asarray(x.view(ml_dtypes.bfloat16))
    assert np.array_equal(np.asarray(arr).view(np.uint16), x)  # upload exact
    z = ZipNN(input_format="jax", engine="tpu", compression_chunk=16384)
    c = z.compress(arr)
    back = ZipNN(input_format="jax", engine="tpu").decompress(c)
    assert back.dtype == jnp.bfloat16
    assert np.array_equal(np.asarray(back).view(np.uint16), x)


def test_jax_device_output_fp32_ragged():
    from zipnn_tpu import ZipNN

    x = RNG.standard_normal(50_001).astype(np.float32) * 0.05
    arr = jnp.asarray(x)
    z = ZipNN(input_format="jax", engine="tpu", compression_chunk=16384,
              huffman_table="shared")
    c = z.compress(arr)
    back = ZipNN(input_format="jax", engine="tpu").decompress(c)
    assert np.array_equal(np.asarray(back), x)


def test_tiny_chunk_compress_delegates_to_host():
    """compression_chunk < 512 B: the device transforms need 128-word
    tiles, so the tpu engine must delegate compress to the numpy golden
    model instead of crashing (the reference allows any power-of-2
    chunk; regression: reshape error for 256 B chunks)."""
    from zipnn_tpu import ZipNN

    data = np.clip(
        RNG.normal(128, 3, 7 * 256), 0, 255
    ).astype(np.uint8).tobytes()
    for shared in (False, True):
        kw = dict(
            input_format="byte", bytearray_dtype="bfloat16",
            compression_chunk=256,
            huffman_table="shared" if shared else "per_chunk",
        )
        want = bytes(ZipNN(engine="numpy", **kw).compress(data))
        got = bytes(ZipNN(engine="tpu", **kw).compress(data))
        assert got == want
        assert bytes(ZipNN(engine="tpu").decompress(got)) == data


def test_fused_encode_assembly_with_mocked_kernel(monkeypatch):
    """The fused-encode host logic — exact histogram-derived bit counts,
    the RLE/raw/threshold decisions they drive, the skip-raw-plane rule,
    and container assembly — with only the Pallas kernel replaced by a
    contract-faithful numpy fake (the split/histogram/bits dispatches run
    for real as XLA-on-CPU).  Output must be byte-identical to the numpy
    golden engine's shared profile.  This is the default-suite CPU
    coverage for jax_codec.plan_fast_encode's data-dependent paths (the
    compiled kernel itself is covered by the @tpu suite and
    `pytest -m interpret`).
    """
    from zipnn_tpu import ZipNN
    from zipnn_tpu.ops import jax_codec
    from zipnn_tpu.ops.entropy import huf as _huf

    monkeypatch.setattr(jax_codec, "FORCE_DEVICE_PATH", True)

    def fake_plane_call(seg, sw):
        def run(w, t):
            wh = np.ascontiguousarray(w).astype("<u4", copy=False)
            tb = np.asarray(t).astype(np.uint32)
            ent = np.zeros(256, np.uint32)
            ent[0::2] = tb[0, :128] & 0xFFFF
            ent[1::2] = tb[0, :128] >> 16
            vals = (ent & 0xFF).astype(np.uint16)
            lens = ((ent >> 8) & 0xFF).astype(np.uint8)
            S = wh.shape[0]
            rows = np.zeros((S, sw), "<u4")
            bits = np.zeros(S, np.int64)
            for s in range(S):
                syms = wh[s].view(np.uint8)
                blob = _huf.encode_stream(syms, vals, lens)
                bits[s] = int(lens[syms].astype(np.int64).sum()) + 1
                if (lens[syms] == 0).any():  # kernel bit-30 uncodeable flag
                    bits[s] |= 1 << 30
                bv = np.frombuffer(blob, np.uint8)
                r8 = rows[s].view(np.uint8)
                n = min(bv.size, r8.size)
                r8[:n] = bv[:n]
            return jnp.asarray(rows.view("<u4")), jnp.asarray(bits)

        return run

    monkeypatch.setattr(jax_codec, "_fused_encode_plane_call", fake_plane_call)

    chunk = 1024
    n_chunks = 24
    exp = np.full((n_chunks, chunk // 2), 190, np.uint8)
    exp += RNG.integers(0, 2, size=exp.shape).astype(np.uint8)
    exp[5] = RNG.integers(0, 256, size=chunk // 2, dtype=np.uint8)  # -> raw cell
    exp[7] = 33  # constant plane chunk -> RLE cell
    man = RNG.integers(0, 256, size=(n_chunks, chunk // 2), dtype=np.uint8)  # raw
    data = np.stack([man, exp], axis=-1).reshape(-1).tobytes()

    golden = ZipNN(
        engine="numpy", huffman_table="shared", compression_chunk=chunk
    ).compress(data)
    plan = jax_codec.plan_fast_encode(
        np.frombuffer(data, np.uint8), 2, 1, 10, chunk
    )
    assert plan is not None
    run, words_dev, assemble = plan
    payload = assemble(*run(words_dev))
    from zipnn_tpu.core.header import HEADER_LEN

    assert payload == bytes(golden[HEADER_LEN:])
    assert bytes(ZipNN().decompress(bytes(golden))) == data


def test_histogram_rows_words_matches_cells():
    """The position-packed word histogram must agree exactly with the
    per-byte nibble formulation (both exact: bf16 one-hots, f32 sums)."""
    from zipnn_tpu.ops import jax_entropy

    rng = np.random.default_rng(5)
    for R, W in ((3, 32), (17, 256), (64, 1024)):
        data = rng.integers(0, 256, (R, W * 4), dtype=np.uint8)
        words = jnp.asarray(np.ascontiguousarray(data).view("<u4"))
        a = np.asarray(jax_entropy.histogram_rows_words(words))
        b = np.asarray(jax_entropy.histogram_cells(jnp.asarray(data)))
        assert np.array_equal(a, b)
        want = np.stack([np.bincount(r, minlength=256) for r in data])
        assert np.array_equal(a, want)


# ---------------------------------------------------------------------------
# decode-plan host machinery (ops/jax_decode.py)
# ---------------------------------------------------------------------------

def _pc_geom(n_chunks=10, chunk=8192, seed=0):
    rng = np.random.default_rng(seed)
    n = n_chunks * chunk
    # mix: compressible cells, RLE regions, incompressible (raw) regions
    data = np.clip(rng.normal(128, 4, n), 0, 255).astype(np.uint8)
    data[2 * chunk : 3 * chunk] = 0
    data[5 * chunk : 6 * chunk] = rng.integers(0, 256, chunk, dtype=np.uint8)
    payload = codec.compress_payload_numpy(data, 2, 1, 10, chunk)
    from zipnn_tpu.ops import jax_decode

    g = jax_decode._parse_geometry(payload, 2, chunk, n, 1, 10)
    return g, data, payload


def test_decode_plan_batch_caps_and_perm():
    """Uniform-batch capacities cover every batch; the per-batch perm maps
    each (chunk, plane) to exactly one row and padding rows are never
    referenced."""
    from zipnn_tpu.ops import jax_decode

    g, _data, _payload = _pc_geom()
    plan = jax_decode._PCPlan.build(g)
    assert plan is not None
    for B in (3, 4, 10):
        n_batches = -(-g.full // B)
        caps = jax_decode._batch_caps(g, B, n_batches)
        ns_cap, nr_cap, nh_cap = caps
        for lo in range(0, g.full, B):
            hi = min(lo + B, g.full)
            host, meta = jax_decode._batch_host(plan, lo, hi, caps, B)
            n_hf = meta["S_real"] // 4
            assert n_hf <= nh_cap
            perm = host["perm"].reshape(B, g.num_buf)
            # every real (chunk, plane) points into a populated row class
            for c in range(hi - lo):
                for b in range(g.num_buf):
                    r = int(perm[c, b])
                    assert 0 <= r < ns_cap + nr_cap + nh_cap
            # huf lane geometry: real lanes populated, pad lanes default
            rs = host["row_starts"]
            S_pad = rs.size
            assert S_pad % jax_decode.pallas_huf.BLOCK == 0
            assert np.all(rs[meta["S_real"]:] == 0)
            if n_hf:
                assert np.all(rs[: meta["S_real"]] >= 0)
                assert meta["slens"].size == meta["S_real"]


def test_decode_plan_caps_range_matches_loop():
    from zipnn_tpu.ops import jax_decode

    g, _d, _p = _pc_geom(seed=3)
    for lo, hi in [(0, 4), (3, 9), (0, g.full)]:
        caps = jax_decode._batch_caps_range(g, lo, hi)
        hb, hc = g.huf_cells
        assert caps[2] == int(np.count_nonzero((hc >= lo) & (hc < hi)))


def test_shared_plan_build_eligibility():
    """Shared plan accepts identical-header containers and rejects
    per-chunk-table ones (which the PC plan then takes)."""
    from zipnn_tpu.ops import jax_decode

    chunk, n_chunks = 8192, 6
    # one compressible plane (bf16-like): the single-table kernel requires
    # every HUF cell to carry the same header; two-plane-compressible
    # shared containers carry one table per plane and route to the
    # per-cell plan instead
    data = np.frombuffer(_bf16ish(chunk * n_chunks).tobytes(), np.uint8).copy()
    shared_payload = codec.compress_payload_numpy(
        data, 2, 1, 10, chunk, shared_tables=True
    )
    pc_payload = codec.compress_payload_numpy(data, 2, 1, 10, chunk)
    g_sh = jax_decode._parse_geometry(shared_payload, 2, chunk, data.size, 1, 10)
    g_pc = jax_decode._parse_geometry(pc_payload, 2, chunk, data.size, 1, 10)
    assert jax_decode._SharedPlan.build(g_sh) is not None
    assert jax_decode._SharedPlan.build(g_pc) is None
    assert jax_decode._PCPlan.build(g_pc) is not None


@pytest.mark.tpu
def test_tpu_fp8_fused_decode_roundtrip():
    """fp8 (single-plane, 128 KB chunk cap) containers route through the
    per-cell fast path on hardware (seg=32768 exceeds the shared kernel's
    VMEM gate) and decode bit-exactly."""
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs a real TPU")
    from zipnn_tpu import ZipNN

    rng = np.random.default_rng(13)
    # e4m3-ish weights: sign+exp structure → compressible single plane
    vals = np.clip(rng.normal(120, 6, 5 * 128 * 1024 + 333), 0, 255)
    data = vals.astype(np.uint8).tobytes()
    comp = ZipNN(
        engine="numpy", bytearray_dtype="float8_e4m3fn"
    ).compress(data)
    got = ZipNN(engine="tpu").decompress(bytes(comp))
    assert bytes(got) == data


# ---------------------------------------------------------------------------
# starvation patch path (ops/jax_decode.py drain)
# ---------------------------------------------------------------------------

def _plan_with_meta(g):
    from zipnn_tpu.ops import jax_decode

    plan = jax_decode._PCPlan.build(g)
    assert plan is not None
    caps = jax_decode._batch_caps_range(g, 0, g.full)
    host, meta = jax_decode._batch_host(plan, 0, g.full, caps, g.full)
    return plan, caps, host, meta


def _good_pend(meta):
    S = meta["S_real"]
    pend = np.zeros(
        -(-max(S, 1) // 2048) * 2048, np.int64
    )
    pend[:S] = 8 * (np.asarray(meta["end_in_row"]) - np.asarray(meta["slens"]))
    return pend


def test_check_pend_reports_starved_cells():
    """Starved lanes raise _PCStarved carrying the affected cell positions;
    non-starved lanes are still validated exactly first."""
    from zipnn_tpu.ops import jax_decode, pallas_huf_pc as pc

    g, _d, _p = _pc_geom()
    _plan, _caps, _host, meta = _plan_with_meta(g)
    S = meta["S_real"]
    assert S >= 8  # at least two HUF cells in the fixture
    pend = _good_pend(meta)
    want = pend.copy()
    # starve cell 1 (lanes 4..7)
    pend[4:8] = pc.STARVED + want[4:8]
    with pytest.raises(jax_decode._PCStarved) as ei:
        jax_decode._check_pend(pend, meta, False)
    assert np.array_equal(ei.value.cells, [1])
    # under rate12 provisioning the same flag is a kernel bug
    with pytest.raises(RuntimeError, match="rate12"):
        jax_decode._check_pend(pend, meta, True)
    # a genuinely corrupt lane elsewhere wins over the starvation signal
    pend2 = pend.copy()
    pend2[0] = want[0] + 3
    from zipnn_tpu.errors import CorruptChunkError

    with pytest.raises(CorruptChunkError):
        jax_decode._check_pend(pend2, meta, False)


def test_host_decode_chunk_matches_golden():
    from zipnn_tpu.ops import jax_decode

    g, data, _p = _pc_geom()
    for c in range(g.full):
        got = jax_decode._host_decode_chunk(g, c)
        assert np.array_equal(got, data[c * g.chunk_size : (c + 1) * g.chunk_size])


def _fake_fast_run(monkeypatch, g, data, starve_plan):
    """Drive _run_fast with a faked device layer.

    ``starve_plan``: {batch_index: [absolute starved chunk ids]} — the fake
    fused call marks those cells' lanes starved on the base-class attempt
    (and garbles the chunk words), and decodes cleanly under force12.
    Returns (out_bytes, calls) where calls records force12 per invocation.
    """
    from zipnn_tpu.ops import jax_decode, pallas_huf_pc as pc

    plan = jax_decode._PCPlan.build(g)
    assert plan is not None and not plan.rate12
    monkeypatch.setattr(jax_decode, "_tiles_call", lambda RT: (lambda x: None))
    monkeypatch.setattr(jax_decode, "_to_dev", lambda p, tiles, host: (host,))
    monkeypatch.setattr(jax_decode, "_max_batch_chunks", lambda cs: 4)
    orig_bh = jax_decode._batch_host

    def bh(plan_, lo, hi, caps, B):
        host, meta = orig_bh(plan_, lo, hi, caps, B)
        host["_range"] = (lo, hi)
        return host, meta

    monkeypatch.setattr(jax_decode, "_batch_host", bh)
    calls = []
    words = np.frombuffer(data, "<u4").reshape(g.full, g.chunk_size // 4)

    def fused_call(caps, B, force12=False):
        def run(host):
            lo, hi = host["_range"]
            calls.append((lo, hi, force12))
            _h, meta = orig_bh(plan, lo, hi, caps, B)
            ow = np.zeros((B, g.chunk_size // 4), np.uint32)
            ow[: hi - lo] = words[lo:hi]
            pend = _good_pend(meta)
            starved = starve_plan.get(lo // 4, [])
            if not force12:
                hbb, hcc = meta["cells"]
                for sc in starved:
                    lanes = np.nonzero(hcc == sc)[0]
                    assert lanes.size  # the starved chunk must have a HUF cell
                    for cell in lanes:
                        pend[4 * cell : 4 * cell + 4] += pc.STARVED
                        ow[sc - lo] ^= 0xDEADBEEF  # garbage output
            return ow, pend

        return run

    plan.fused_call = fused_call
    out = np.empty(g.orig_size, np.uint8)
    res = jax_decode._run_fast(plan, g, out, False)
    return bytes(res), calls


def test_run_fast_starvation_patches_chunks(monkeypatch):
    """A single starved chunk is re-decoded host-side and patched; no
    rate12 re-submit of the batch happens."""
    pytest.importorskip("zipnn_tpu.native")
    from zipnn_tpu import native

    try:
        native._load()
    except Exception:
        pytest.skip("native engine unavailable")
    g, data, _p = _pc_geom(n_chunks=12)
    got, calls = _fake_fast_run(monkeypatch, g, data, {1: [6]})
    assert got == data.tobytes()
    assert all(not f for (_lo, _hi, f) in calls)


def test_run_fast_starvation_widespread_falls_back_sticky(monkeypatch):
    """When most of a batch starves, the whole batch re-runs under rate12
    and the class sticks for batches submitted after the starved drain
    (the depth-2 pipeline has already submitted the next batch base-class)."""
    g, data, _p = _pc_geom(n_chunks=20)
    # batch 1 = chunks 4..8: starve 3 of 4 (> B//8 threshold)
    got, calls = _fake_fast_run(monkeypatch, g, data, {1: [4, 6, 7]})
    assert got == data.tobytes()
    lo_f12 = [lo for (lo, _hi, f) in calls if f]
    # retry of batch 1, then sticky rate12 for batches 3 and 4 (batch 2
    # was already in flight base-class when the starvation drained)
    assert lo_f12 == [4, 12, 16]


def test_run_fast_starvation_is_container_scoped(monkeypatch):
    """A starved container must NOT slow the next one: the sticky rate12
    class lives in the _run_fast call (one container), never in process
    state — ZIPNN_TPU_RATE12 stays an explicit operator override only
    (round-3 VERDICT item 9)."""
    g1, data1, _p1 = _pc_geom(n_chunks=20)
    got1, calls1 = _fake_fast_run(monkeypatch, g1, data1, {1: [4, 6, 7]})
    assert got1 == data1.tobytes()
    assert any(f for (_lo, _hi, f) in calls1)  # container 1 did flip
    g2, data2, _p2 = _pc_geom(n_chunks=20)
    got2, calls2 = _fake_fast_run(monkeypatch, g2, data2, {})
    assert got2 == data2.tobytes()
    assert all(not f for (_lo, _hi, f) in calls2), (
        "sticky rate12 leaked into an unrelated container"
    )


@pytest.mark.tpu
def test_tpu_starvation_patch_end_to_end(monkeypatch):
    """A sustained local entropy spike inside one chunk of an otherwise
    narrow-distribution container starves the base-rate kernel class for
    exactly that chunk (verified deterministic in the schedule simulator);
    the fused decode must patch it host-side — one device pass, no
    whole-batch rate12 retry — and return bit-exact output."""
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs a real TPU")
    from zipnn_tpu.ops import jax_decode

    rng = np.random.default_rng(7)
    chunk = 256 * 1024
    n_chunks = 8
    data = np.clip(rng.normal(128, 3, n_chunks * chunk), 0, 255).astype(np.uint8)
    spike = 12_000
    data[3 * chunk + 100_000 : 3 * chunk + 100_000 + spike] = rng.integers(
        0, 256, spike, np.uint8
    )
    payload = codec.compress_payload_numpy(data, 2, 1, 10, chunk)
    g = jax_decode._parse_geometry(payload, 2, chunk, data.size, 1, 10)
    plan = jax_decode._PCPlan.build(g)
    assert plan is not None and not plan.rate12  # base class must be chosen

    patched = []
    orig = jax_decode._host_decode_chunk

    def counting(g_, c):
        patched.append(c)
        return orig(g_, c)

    monkeypatch.setattr(jax_decode, "_host_decode_chunk", counting)
    fused = []
    orig_pc = jax_decode._fused_pc_decode

    def counting_pc(*a):
        fused.append(a[-1])  # rate12 flag
        return orig_pc(*a)

    monkeypatch.setattr(jax_decode, "_fused_pc_decode", counting_pc)
    got = jax_codec.decompress_payload(payload, 2, 1, 10, chunk, data.size)
    assert bytes(got) == data.tobytes()
    assert patched == [3], "the starved chunk must be host-patched"
    assert all(not f for f in fused), "no rate12 batch retry expected"


def test_patch_eligibility_threshold():
    """Patch host-side up to 1/8 of the batch; beyond that the rate12
    batch retry is cheaper (and sticky for the container)."""
    pytest.importorskip("zipnn_tpu.native")
    from zipnn_tpu import native
    from zipnn_tpu.ops import jax_decode

    try:
        native._load()
    except Exception:
        pytest.skip("native engine unavailable")
    assert jax_decode._patch_eligible(1, 4)     # max(1, 0) floor
    assert jax_decode._patch_eligible(4, 32)
    assert not jax_decode._patch_eligible(5, 32)
    assert not jax_decode._patch_eligible(2, 8)
