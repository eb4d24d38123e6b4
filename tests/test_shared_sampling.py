"""Shared-table profile: sampled table build + hopeless-plane skip.

Format policy (codec.py): at >= SHARED_SAMPLE_MIN_CHUNKS chunks the plane
table is built from every SHARED_SAMPLE_STRIDE-th chunk only, a plane
whose sampled expected code length cannot beat the threshold stores every
cell raw (RLE still applies), and a cell containing a byte the sample
never saw stores raw.  All engines must produce identical bytes under the
policy; below the gate, bytes are the legacy exact build.
"""
import numpy as np
import pytest

from zipnn_tpu import codec
from zipnn_tpu.ops.entropy import huf

RNG = np.random.default_rng(42)

CHUNK = 1024  # tiny chunks so >=512-chunk containers stay small
NB = 2


def _interleave(exp_cells, man_cells):
    """Build bf16-shaped input whose byte planes are the given cells
    (byte_reorder=10, bit_reorder=0: plane0 = even bytes, plane1 = odd)."""
    n_chunks, half = exp_cells.shape
    out = np.empty((n_chunks, half, 2), np.uint8)
    out[:, :, 0] = man_cells
    out[:, :, 1] = exp_cells
    return out.reshape(-1)


def _mk(n_chunks, rare_chunk=None):
    """Compressible exponent plane + incompressible mantissa plane; when
    ``rare_chunk`` is given, that chunk's exponent cell gets a byte value
    that appears nowhere else (so a sampled table cannot code it)."""
    half = CHUNK // 2
    exp = np.clip(RNG.normal(128, 3, (n_chunks, half)), 0, 255).astype(np.uint8)
    if rare_chunk is not None:
        exp[rare_chunk, 7] = 251  # nowhere near N(128, 3)
    man = RNG.integers(0, 256, (n_chunks, half), dtype=np.uint8)
    return _interleave(exp, man), exp, man


def _compress(data, threshold=0.95):
    return codec.compress_payload_numpy(
        data, NB, 0, 10, CHUNK, threshold, shared_tables=True
    )


def _types(payload, n_chunks):
    types, _starts, _ds = codec.parse_tables(payload, NB, n_chunks)
    return types


def _roundtrip(payload, data):
    back = codec.decompress_payload_numpy(payload, NB, 0, 10, CHUNK, data.size)
    assert np.array_equal(back, data)


def test_stride_gate_boundary():
    assert codec.shared_sample_stride(511) == 1
    assert codec.shared_sample_stride(512) == codec.SHARED_SAMPLE_STRIDE


def test_below_gate_matches_legacy_exact_build():
    """< 512 chunks: the table is the full-histogram build — container
    bytes must equal a hand-built legacy encode."""
    n_chunks = 24
    data, exp, _man = _mk(n_chunks)
    payload = _compress(data)
    # legacy reference: full-plane table, every cell tried
    count = np.bincount(exp.reshape(-1), minlength=256).astype(np.int64)
    table = huf.build_shared_table(count)
    blob = codec.compress_cell_shared(exp[0], table)
    assert blob is not None and len(blob) < exp[0].size * 0.95
    _roundtrip(payload, data)
    types = _types(payload, n_chunks)
    assert types[1].all() and not types[0].any()  # exp huf, man raw


def test_sampled_table_and_hopeless_plane():
    """>= 512 chunks: mantissa plane is hopeless (zero huf cells without
    per-cell attempts), exponent plane compresses, roundtrip bit-exact."""
    n_chunks = 520
    data, _exp, _man = _mk(n_chunks)
    payload = _compress(data)
    types = _types(payload, n_chunks)
    assert not types[0].any()  # hopeless mantissa plane: all raw
    # nearly all exponent cells pass; the few misses are cells holding a
    # tail byte the 1/8 sample never saw (tiny 512-byte cells exaggerate
    # this — at MB-scale samples the miss rate is ~0)
    assert types[1].sum() >= int(n_chunks * 0.95)
    _roundtrip(payload, data)


def test_uncodeable_cell_stores_raw():
    """A cell whose rare byte the sample never saw must store raw — and
    still roundtrip bit-exactly."""
    n_chunks = 520
    rare = 9  # 9 % 8 != 0 -> not sampled
    assert rare % codec.SHARED_SAMPLE_STRIDE != 0
    data, exp, _man = _mk(n_chunks, rare_chunk=rare)
    # the rare byte really is absent from the sampled set
    samp = exp[:: codec.SHARED_SAMPLE_STRIDE]
    assert 251 not in samp
    payload = _compress(data)
    types = _types(payload, n_chunks)
    assert types[1, rare] == 0  # uncodeable cell -> raw
    assert types[1, rare - 1] == 1 and types[1, rare + 1] == 1
    _roundtrip(payload, data)


def test_rle_cells_survive_on_hopeless_plane():
    n_chunks = 520
    data, _exp, man = _mk(n_chunks)
    man[33] = 77  # constant mantissa cell
    data = _interleave(_exp_from(data, n_chunks), man)
    payload = _compress(data)
    types = _types(payload, n_chunks)
    assert types[0, 33] == 1  # RLE block on the otherwise-raw plane
    assert types[0, 32] == 0 and types[0, 34] == 0
    _roundtrip(payload, data)


def _exp_from(data, n_chunks):
    return data.reshape(n_chunks, CHUNK // 2, 2)[:, :, 1].copy()


def test_hopeless_rule_is_pure_double_math():
    """The hopeless predicate is an exact IEEE expression both spec sides
    must reproduce (engines are compared at the container level in
    test_native.py; this pins the reference values)."""
    count = np.zeros(256, np.int64)
    count[:16] = 1000
    lengths = np.full(256, 8, np.uint8)
    lengths[:16] = 4
    assert not codec.shared_plane_hopeless(count, lengths, 0.95)
    assert codec.shared_plane_hopeless(count, lengths, 0.5 - 1e-9)
    # boundary: bits exactly == threshold*8*total counts as hopeless
    count2 = np.zeros(256, np.int64)
    count2[0] = 100
    count2[1] = 100
    lengths2 = np.zeros(256, np.uint8)
    lengths2[0] = lengths2[1] = 4
    assert codec.shared_plane_hopeless(count2, lengths2, 0.5)


@pytest.mark.parametrize("n_chunks", [511, 512, 513])
def test_gate_boundary_roundtrips(n_chunks):
    data, _e, _m = _mk(n_chunks)
    payload = _compress(data)
    _roundtrip(payload, data)


def test_jax_engine_byte_identical_under_sampling():
    """The tpu-engine (XLA fallback on CPU) compress must reproduce the
    sampled-table policy byte-for-byte, including the tail-cell rule."""
    from zipnn_tpu.ops import jax_codec

    n_chunks = 514  # 513 full chunks + ragged tail
    data, _e, _m = _mk(n_chunks, rare_chunk=9)
    data = data[: 513 * CHUNK + 700]
    p_np = codec.compress_payload_numpy(
        data, NB, 0, 10, CHUNK, 0.95, shared_tables=True
    )
    p_jx = jax_codec.compress_payload(
        data, NB, 0, 10, CHUNK, 0.95, shared_tables=True
    )
    assert bytes(p_jx) == p_np


def _fake_plane_call(seg, sw):
    """Contract-faithful numpy stand-in for the Pallas encode kernel
    (exact blob bytes + exact bit counts incl. the sentinel)."""
    import jax.numpy as jnp

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
            blob = huf.encode_stream(syms, vals, lens)
            bits[s] = int(lens[syms].astype(np.int64).sum()) + 1
            if (lens[syms] == 0).any():  # kernel bit-30 uncodeable flag
                bits[s] |= 1 << 30
            bv = np.frombuffer(blob, np.uint8)
            r8 = rows[s].view(np.uint8)
            n = min(bv.size, r8.size)
            r8[:n] = bv[:n]
        return jnp.asarray(rows.view("<u4")), jnp.asarray(bits)

    return run


@pytest.mark.parametrize("n_chunks,rare", [(520, 9), (512, 100), (513, None)])
def test_fused_encode_sampled_path(monkeypatch, n_chunks, rare):
    """plan_fast_encode's sampled pipeline (sampled MXU histogram, kernel
    bit counts, elementwise RLE + uncodeable sweeps) must assemble a
    payload byte-identical to the numpy spec — with only the Pallas
    kernel faked; the sampled split/hist and uncodeable-scan dispatches
    run for real as XLA-on-CPU."""
    from zipnn_tpu.ops import jax_codec

    monkeypatch.setattr(jax_codec, "FORCE_DEVICE_PATH", True)
    monkeypatch.setattr(jax_codec, "_fused_encode_plane_call", _fake_plane_call)

    data, _exp, man = _mk(n_chunks, rare_chunk=rare)
    man[33] = 77  # RLE cell on the hopeless mantissa plane
    data = _interleave(_exp_from(data, n_chunks), man)
    want = _compress(data)
    plan = jax_codec.plan_fast_encode(data, NB, 0, 10, CHUNK)
    assert plan is not None
    run, words_dev, assemble = plan
    payload = assemble(*run(words_dev))
    assert bytes(payload) == want
    _roundtrip(bytes(payload), data)


@pytest.mark.parametrize("n_chunks,extra", [
    (24, 317),    # legacy exact build + ragged tail
    (519, 700),   # sampled build, tail index 519 NOT on stride
    (520, 96),    # sampled build, tail index 520 on stride (tail sampled)
])
def test_fused_encode_ragged_tail(monkeypatch, n_chunks, extra):
    """plan_fast_encode now accepts non-chunk-aligned input: the ragged
    tail cell runs through the numpy golden model at assembly and the
    table histogram includes the tail exactly when the spec says so
    (always below the gate; at >= 512 chunks only when its index is on
    the sample stride)."""
    from zipnn_tpu.ops import jax_codec

    monkeypatch.setattr(jax_codec, "FORCE_DEVICE_PATH", True)
    monkeypatch.setattr(jax_codec, "_fused_encode_plane_call", _fake_plane_call)

    data, _e, _m = _mk(n_chunks + 1, rare_chunk=9 if n_chunks > 512 else None)
    data = data[: n_chunks * CHUNK + extra]
    want = _compress(data)
    plan = jax_codec.plan_fast_encode(data, NB, 0, 10, CHUNK)
    assert plan is not None
    run, words_dev, assemble = plan
    payload = assemble(*run(words_dev))
    assert bytes(payload) == want
    _roundtrip(bytes(payload), data)


def test_fused_encode_prefix_len(monkeypatch):
    """prefix_len reserves caller-filled header space at the front of one
    contiguous buffer (the zero-join convention ZipNN uses)."""
    from zipnn_tpu.ops import jax_codec

    monkeypatch.setattr(jax_codec, "FORCE_DEVICE_PATH", True)
    monkeypatch.setattr(jax_codec, "_fused_encode_plane_call", _fake_plane_call)

    data, _e, _m = _mk(24)
    want = _compress(data)
    run, words_dev, assemble = jax_codec.plan_fast_encode(data, NB, 0, 10, CHUNK)
    out = assemble(*run(words_dev), prefix_len=17)
    assert isinstance(out, np.ndarray) and out.size == 17 + len(want)
    assert bytes(out[17:].tobytes()) == want


def test_zipnn_tpu_engine_routes_through_fused_encode(monkeypatch):
    """ZipNN(engine='tpu', huffman_table='shared') compress must take the
    fused plan_fast_encode pipeline when eligible (it was bench-only
    before) and still emit numpy-spec bytes, ragged tail included."""
    from zipnn_tpu import ZipNN
    from zipnn_tpu.ops import jax_codec

    monkeypatch.setattr(jax_codec, "FORCE_DEVICE_PATH", True)
    monkeypatch.setattr(jax_codec, "_fused_encode_plane_call", _fake_plane_call)
    seen = {}
    orig = jax_codec.plan_fast_encode

    def spy(*a, **kw):
        plan = orig(*a, **kw)
        seen["plan"] = plan is not None
        return plan

    monkeypatch.setattr(jax_codec, "plan_fast_encode", spy)

    data, _e, _m = _mk(30)
    data = np.ascontiguousarray(data[: 29 * CHUNK + 500]).tobytes()
    kw = dict(input_format="byte", bytearray_dtype="bfloat16",
              compression_chunk=CHUNK, huffman_table="shared")
    want = bytes(ZipNN(engine="numpy", **kw).compress(data))
    got = bytes(ZipNN(engine="tpu", **kw).compress(data))
    assert seen.get("plan") is True
    assert got == want
    back = ZipNN(engine="numpy", **kw).decompress(got)
    assert bytes(back) == data


def test_fused_encode_sampled_path_fp32(monkeypatch):
    """Same, 4-plane fp32 (mode 220) with sign rotation."""
    from zipnn_tpu.ops import jax_codec

    monkeypatch.setattr(jax_codec, "FORCE_DEVICE_PATH", True)
    monkeypatch.setattr(jax_codec, "_fused_encode_plane_call", _fake_plane_call)

    n_chunks = 516
    vals = (RNG.standard_normal(n_chunks * CHUNK // 4) * 0.05).astype(
        np.float32
    )
    data = np.frombuffer(vals.tobytes(), np.uint8)
    want = codec.compress_payload_numpy(
        data, 4, 1, 220, CHUNK, 0.95, shared_tables=True
    )
    plan = jax_codec.plan_fast_encode(data, 4, 1, 220, CHUNK)
    assert plan is not None
    run, words_dev, assemble = plan
    payload = assemble(*run(words_dev))
    assert bytes(payload) == want
    back = codec.decompress_payload_numpy(
        bytes(payload), 4, 1, 220, CHUNK, data.size
    )
    assert np.array_equal(back, data)


@pytest.mark.parametrize("trial", range(8))
def test_fused_encode_fuzz_vs_numpy_spec(monkeypatch, trial):
    """Randomized shapes/dtypes/payload kinds through the fused pipeline
    (fake kernel) vs the numpy spec — gate boundaries, ragged tails,
    RLE runs, rare bytes, constant planes.  A 60-trial sweep of this
    generator ran clean before the bound was committed."""
    from zipnn_tpu.ops import jax_codec

    monkeypatch.setattr(jax_codec, "FORCE_DEVICE_PATH", True)
    monkeypatch.setattr(jax_codec, "_fused_encode_plane_call", _fake_plane_call)

    rng = np.random.default_rng(1000 + trial)
    nb, br, byr = [(1, 1, 10), (2, 0, 10), (2, 1, 10), (4, 1, 220)][trial % 4]
    chunk = int(rng.choice([256, 512, 1024])) * nb
    n_chunks = int(rng.choice([3, 24, 511, 512, 520]))
    extra = int(rng.integers(0, chunk)) if rng.random() < 0.6 else 0
    n = n_chunks * chunk + extra
    kind = trial % 4
    if kind == 0:
        data = rng.integers(0, 256, n, dtype=np.uint8)
    elif kind == 1:
        data = np.clip(rng.normal(128, 2, n), 0, 255).astype(np.uint8)
        idx = rng.integers(0, n, 8)
        data[idx] = rng.integers(0, 256, 8)  # rare bytes
    elif kind == 2:
        data = np.clip(rng.normal(100, 6, n), 0, 255).astype(np.uint8)
        for _ in range(4):  # constant runs -> RLE cells
            i = int(rng.integers(0, max(1, n - chunk)))
            data[i : i + int(rng.integers(1, chunk))] = int(rng.integers(0, 256))
    else:
        data = np.full(n, 7, np.uint8)
        idx = rng.integers(0, n, max(1, n // 1000))
        data[idx] = rng.integers(0, 256, idx.size)
    want = codec.compress_payload_numpy(
        data, nb, br, byr, chunk, 0.95, shared_tables=True
    )
    plan = jax_codec.plan_fast_encode(data, nb, br, byr, chunk, 0.95)
    assert plan is not None
    run, wd, asm = plan
    assert bytes(asm(*run(wd))) == want
    back = codec.decompress_payload_numpy(want, nb, br, byr, chunk, n)
    assert np.array_equal(back, data)


@pytest.mark.parametrize("n_chunks,extra,bb", [
    (540, 700, 128 * 1024),   # 5 batches incl. a ragged-tail final batch
    (540, 0, 64 * 1024),      # aligned, more batches
    (30, 500, 8 * 1024),      # below the sampling gate (stride 1)
    (513, 999, 512 * 1024),   # single batch degenerate
])
def test_batched_fused_encode_matches_spec(monkeypatch, n_chunks, extra, bb):
    """fast_encode_payload_batched (global sampled table -> preset-table
    fused batches -> multihost-style stitch) must be byte-identical to
    the numpy spec at any size/batch split."""
    from zipnn_tpu.ops import jax_codec

    monkeypatch.setattr(jax_codec, "FORCE_DEVICE_PATH", True)
    monkeypatch.setattr(jax_codec, "_fused_encode_plane_call", _fake_plane_call)

    data, _e, man = _mk(n_chunks, rare_chunk=9)
    man[min(33, n_chunks - 1)] = 77
    data = _interleave(_exp_from(data, n_chunks), man).reshape(-1)
    data = data[: (n_chunks - 1) * CHUNK + (extra if extra else CHUNK)]
    want = _compress(data)
    got = jax_codec.fast_encode_payload_batched(
        data, NB, 0, 10, CHUNK, 0.95, batch_bytes=bb
    )
    assert got is not None
    assert bytes(got.tobytes()) == want
    _roundtrip(want, data)


def test_dispatcher_falls_back_to_batched_encode(monkeypatch):
    """When the single-shot fused plan declines (HBM cap), the tpu-engine
    dispatcher takes the batched path and still emits spec bytes."""
    from zipnn_tpu.ops import jax_codec

    monkeypatch.setattr(jax_codec, "FORCE_DEVICE_PATH", True)
    monkeypatch.setattr(jax_codec, "_fused_encode_plane_call", _fake_plane_call)
    orig = jax_codec.plan_fast_encode

    def gate(data, *a, **kw):
        if kw.get("preset_shared") is None:
            return None  # pretend every single-shot call is over the cap
        return orig(data, *a, **kw)

    monkeypatch.setattr(jax_codec, "plan_fast_encode", gate)
    monkeypatch.setenv("ZIPNN_TPU_ENC_BATCH_MB", "1")

    data, _e, _m = _mk(540)
    want = _compress(data)
    got = codec.compress_payload(
        data, NB, 0, 10, CHUNK, 0.95, engine="tpu", shared_tables=True
    )
    assert bytes(got.tobytes()) == want


def test_preset_applies_to_tail_only_input():
    """full == 0 (a lone ragged tail chunk — a multihost process's local
    range can be exactly this) must still honor preset_shared in the jax
    generic path; regression: the preset was silently ignored and the
    tail stored raw."""
    from zipnn_tpu.ops import jax_codec

    data, _e, _m = _mk(600)
    stride = codec.shared_sample_stride(600)
    counts = codec.sampled_plane_counts(data, NB, 0, 10, CHUNK, 0, stride)
    preset = codec.shared_tables_from_counts(counts, 0.95, stride)
    tail = np.ascontiguousarray(data[: CHUNK // 2])  # < one chunk
    want = codec.compress_payload_numpy(
        tail, NB, 0, 10, CHUNK, 0.95, shared_tables=True,
        preset_shared=preset,
    )
    got = jax_codec.compress_payload(
        tail, NB, 0, 10, CHUNK, 0.95, shared_tables=True,
        preset_shared=preset,
    )
    assert bytes(got) == want
    types, _s, _d = codec.parse_tables(want, NB, 1)
    assert types[1, 0] == 1  # the preset actually compressed the cell


def test_native_sampled_counts_parity():
    """The C++ sampled-histogram twin must produce the exact integers of
    the python sweep for every grouping / stride / global offset,
    including ragged tails and empty local ranges."""
    native = pytest.importorskip("zipnn_tpu.native")
    rng = np.random.default_rng(8)
    for nb, br, byr in ((1, 1, 10), (2, 1, 10), (4, 1, 220)):
        chunk = 1024 * nb
        for n in (chunk * 21 + 555, 100, 0):
            data = rng.integers(0, 256, n, dtype=np.uint8)
            for g0, stride in ((0, 1), (5, 8), (13, 4)):
                a = native.sampled_counts(
                    data, nb, br, byr, chunk, g0, stride
                )
                counts = np.zeros((nb, 256), dtype=np.int64)
                n_chunks = codec.num_chunks_for(n, chunk)
                from zipnn_tpu.ops import byte_group

                for c in range((-g0) % stride, n_chunks, stride):
                    planes = byte_group.split(
                        data[c * chunk : min((c + 1) * chunk, n)],
                        nb, byr, br,
                    )
                    for b in range(nb):
                        if planes[b].size:
                            counts[b] += np.bincount(
                                planes[b], minlength=256
                            )
                assert np.array_equal(a, counts), (nb, n, g0, stride)


def test_preset_tables_cross_engine():
    """Externally built (multihost-style) preset tables: numpy and native
    must emit identical bytes when compressing a LOCAL RANGE with a table
    built from the GLOBAL sampled histogram — incl. a hopeless plane, an
    uncodeable rare byte, and a global stride larger than the local
    container's own gate would pick."""
    native = pytest.importorskip("zipnn_tpu.native")
    data, _e, man = _mk(540, rare_chunk=9)
    man[33] = 77
    data = _interleave(_exp_from(data, 540), man).reshape(-1)
    data = data[: 539 * CHUNK + 700]
    stride = codec.shared_sample_stride(codec.num_chunks_for(data.size, CHUNK))
    assert stride > 1
    counts = codec.sampled_plane_counts(data, NB, 0, 10, CHUNK, 0, stride)
    preset = codec.shared_tables_from_counts(counts, 0.95, stride)
    piece = np.ascontiguousarray(data[: 200 * CHUNK])  # "process 0's range"
    p_np = codec.compress_payload_numpy(
        piece, NB, 0, 10, CHUNK, 0.95, shared_tables=True, preset_shared=preset
    )
    p_nat = native.compress_payload_shared(
        piece, NB, 0, 10, CHUNK, 0.95, 1, preset=preset
    )
    assert bytes(memoryview(p_nat)) == p_np
    # the piece decodes standalone (cells are self-describing)
    back = codec.decompress_payload_numpy(p_np, NB, 0, 10, CHUNK, piece.size)
    assert np.array_equal(back, piece)
    # dispatcher routing: engine='native' honors preset_shared
    d = codec.compress_payload(
        piece, NB, 0, 10, CHUNK, 0.95, engine="native",
        shared_tables=True, preset_shared=preset,
    )
    assert bytes(d) == p_np


@pytest.mark.parametrize("n_chunks", [511, 513, 520])
def test_native_byte_identical_under_sampling(n_chunks):
    """The native engine must reproduce the sampled-table policy exactly
    (same table, same hopeless skip, same uncodeable-cell raws)."""
    native = pytest.importorskip("zipnn_tpu.native")
    data, _e, _m = _mk(n_chunks, rare_chunk=9)
    p_np = _compress(data)
    p_nat = native.compress_payload_shared(data, NB, 0, 10, CHUNK, 0.95, 2)
    assert bytes(memoryview(p_nat)) == p_np
    # and with a bit_reorder=1 bf16-style container at a larger chunk
    big = _mk(n_chunks)[0]
    p_np2 = codec.compress_payload_numpy(
        big, NB, 1, 10, CHUNK, 0.95, shared_tables=True
    )
    p_nat2 = native.compress_payload_shared(big, NB, 1, 10, CHUNK, 0.95, 2)
    assert bytes(memoryview(p_nat2)) == p_np2


def test_stage_pool_recycles_and_bounds(monkeypatch):
    """The per-batch encode staging pool: acquire reuses a released
    buffer >= the requested size, release bounds retained bytes by
    ZIPNN_TPU_STAGE_POOL_MB (oldest dropped first)."""
    from zipnn_tpu.ops import jax_codec

    monkeypatch.setattr(jax_codec, "_STAGE_POOL", [])
    a = jax_codec._stage_pool_acquire(1 << 20)
    b = jax_codec._stage_pool_acquire(1 << 20)
    assert a is not b
    jax_codec._stage_pool_release([a, b])
    c = jax_codec._stage_pool_acquire(1 << 19)  # smaller: reuse
    assert c is a or c is b
    d = jax_codec._stage_pool_acquire(1 << 21)  # larger: fresh
    assert d is not a and d is not b

    monkeypatch.setenv("ZIPNN_TPU_STAGE_POOL_MB", "1")
    jax_codec._stage_pool_release(
        [np.empty(1 << 19, np.uint8) for _ in range(4)]
    )
    kept = sum(x.nbytes for x in jax_codec._STAGE_POOL)
    assert kept <= 1 << 20


def test_batched_encode_releases_stage_bufs_on_every_exit(monkeypatch):
    """fast_encode_payload_batched must return its per-batch staging
    buffers to the pool even when it bails early (non-TPU platform here:
    the first submit returns None)."""
    from zipnn_tpu.ops import jax_codec

    monkeypatch.setattr(jax_codec, "_STAGE_POOL", [])
    monkeypatch.setattr(jax_codec, "_platform_is_tpu", lambda: True)
    # batches turn out ineligible mid-flight (first submit gets None)
    monkeypatch.setattr(
        jax_codec, "plan_fast_encode", lambda *a, **k: None
    )
    data = RNG.integers(0, 255, 4 * CHUNK, dtype=np.uint8)
    out = jax_codec.fast_encode_payload_batched(
        data, NB, 0, 10, CHUNK, batch_bytes=2 * CHUNK
    )
    assert out is None
    assert len(jax_codec._STAGE_POOL) >= 1  # buffers released, not leaked
