"""Encode kernel schedule simulator (CPU) + TPU-gated kernel test."""
import numpy as np
import pytest

from zipnn_tpu.ops import pallas_huf_enc
from zipnn_tpu.ops.entropy import huf

RNG = np.random.default_rng(23)


def make_table(datas):
    count = np.bincount(datas.reshape(-1), minlength=256).astype(np.int64)
    lengths = huf.build_code_lengths(count, 8)
    assert lengths is not None
    tlog = int(lengths.max())
    vals = huf.canonical_values(lengths, tlog)
    return lengths, vals


def sim_encode(syms_rev, lengths, vals, SW):
    """Vectorized numpy mirror of the kernel's schedule (exact)."""
    S, seg = syms_rev.shape
    U = np.uint32
    ent_val = vals.astype(U)
    ent_nb = lengths.astype(np.int64)

    acc_lo = np.zeros(S, U)
    acc_hi = np.zeros(S, U)
    nbits = np.zeros(S, np.int64)
    total = np.zeros(S, np.int64)
    wpos = np.zeros(S, np.int64)
    base2 = np.zeros(S, np.int64)
    base3 = np.zeros(S, np.int64)
    w8 = [np.zeros(S, U) for _ in range(8)]
    w3 = np.zeros((64, S), U)
    out = np.zeros((S, SW), U)
    idx = np.arange(S)

    def spill_w3(base3, base2):
        spill = (base2 - base3) >= 32
        c3 = np.maximum(base3, 0) >> 5
        for m in range(32):
            r = np.minimum(c3 * 32 + m, SW - 1)
            out[idx, r] = np.where(spill, w3[m], out[idx, r])
        for m in range(32):
            w3[m] = np.where(spill, w3[m + 32], w3[m])
        return np.where(spill, base3 + 32, base3)

    def dump_w8(base2, base3, wpos, w8):
        dump = (wpos - base2) >= 4
        q2 = np.maximum(base2 - base3, 0) >> 2
        assert np.all((q2 <= 15) | ~dump), "w3 window invariant"
        for k in range(4):
            r = np.minimum(4 * q2 + k, 63)
            w3[r, idx] = np.where(dump, w8[k], w3[r, idx])
        for k in range(4):
            w8[k] = np.where(dump, w8[k + 4], w8[k])
        for k in range(4, 8):
            w8[k] = np.where(dump, U(0), w8[k])
        return np.where(dump, base2 + 4, base2), w8

    bad = np.zeros(S, bool)  # mirrors kernel total bit 30 (uncodeable)

    def append(val, nb):
        nonlocal acc_lo, acc_hi, nbits, total, bad
        bad |= nb == 0
        nbu = nbits.astype(U)
        lo_add = np.where(nbits < 32, (val << (nbu & U(31))).astype(U), U(0))
        hi_sh = np.where(nbits >= 32, nbits - 32, 0).astype(U)
        hi_add = np.where(
            nbits >= 32, (val << hi_sh).astype(U),
            np.where(nbits == 0, U(0), val >> (U(32) - nbu)),
        )
        acc_lo |= lo_add
        acc_hi |= hi_add
        nbits = nbits + nb
        total = total + nb

    def flush():
        nonlocal acc_lo, acc_hi, nbits, wpos
        fl = nbits >= 32
        kk = wpos - base2
        for k in range(8):
            w8[k] = np.where(fl & (kk == k), acc_lo, w8[k])
        acc_lo = np.where(fl, acc_hi, acc_lo)
        acc_hi = np.where(fl, U(0), acc_hi)
        nbits = np.where(fl, nbits - 32, nbits)
        wpos = np.where(fl, wpos + 1, wpos)

    assert seg % 64 == 0
    step = 0
    for outer in range(seg // 64):
        base3 = spill_w3(base3, base2)
        for sub in range(8):
            base2, w8 = dump_w8(base2, base3, wpos, w8)
            for local in range(8):
                s = syms_rev[:, step].astype(np.int64)
                append(ent_val[s], ent_nb[s])
                if local % 2 == 1:
                    flush()
                step += 1

    # sentinel
    nbu = nbits.astype(U)
    s_hi = np.where(nbits >= 32, nbits - 32, 0).astype(U)
    acc_lo = (acc_lo | np.where(nbits < 32, (U(1) << (nbu & U(31))).astype(U), U(0))).astype(U)
    acc_hi = (acc_hi | np.where(nbits >= 32, (U(1) << s_hi).astype(U), U(0))).astype(U)
    nbits = nbits + 1
    total = total + 1
    for _f in range(2):
        base3 = spill_w3(base3, base2)
        base2, w8 = dump_w8(base2, base3, wpos, w8)
        fl = nbits > 0
        kk = wpos - base2
        for k in range(8):
            w8[k] = np.where(fl & (kk == k), acc_lo, w8[k])
        acc_lo = np.where(fl, acc_hi, acc_lo)
        acc_hi = np.where(fl, U(0), acc_hi)
        nbits = np.where(fl, nbits - 32, nbits)
        wpos = np.where(fl, wpos + 1, wpos)
    for _d in range(3):
        base3 = spill_w3(base3, base2 + 64)
    c2 = np.maximum(base2, 0) >> 2
    kk0 = wpos - base2
    for k in range(8):
        r = np.minimum(c2 * 4 + k, SW - 1)
        out[idx, r] = np.where(kk0 > k, w8[k], out[idx, r])
    return out, total | (bad.astype(np.int64) << 30)


@pytest.mark.parametrize("seg", [256, 1024])
def test_sim_encode_matches_host_encoder(seg):
    S = 9
    datas = np.clip(RNG.normal(128, 6, size=(S, seg)), 0, 255).astype(np.uint8)
    lengths, vals = make_table(datas)
    SW = max(96, -(-(seg + 128) // 128) * 32)
    syms_rev = datas[:, ::-1].copy()
    out, total = sim_encode(syms_rev, lengths, vals, SW)
    for i in range(S):
        want = huf.encode_stream(datas[i], vals, lengths)
        nbytes = (int(total[i]) + 7) // 8
        got = out[i].astype("<u4").view(np.uint8)[:nbytes]
        assert np.array_equal(got, np.frombuffer(want, np.uint8)), i


def test_sim_encode_max_rate():
    """Adversarial worst case: uniform bytes give a flat table where every
    code is 8 bits, driving the bit writer at its maximum sustained rate —
    stresses the W3 window invariant (dump index <= 17)."""
    seg = 1024
    datas = RNG.integers(0, 256, size=(7, seg), dtype=np.uint8)
    lengths, vals = make_table(datas)
    assert int(lengths[np.nonzero(lengths)].min()) >= 7  # near-flat codes
    SW = max(96, -(-(seg + 128) // 128) * 32)
    out, total = sim_encode(datas[:, ::-1].copy(), lengths, vals, SW)
    for i in range(7):
        want = huf.encode_stream(datas[i], vals, lengths)
        nbytes = (int(total[i]) + 7) // 8
        got = out[i].astype("<u4").view(np.uint8)[:nbytes]
        assert np.array_equal(got, np.frombuffer(want, np.uint8)), i


def test_sim_encode_bit30_uncodeable_flag():
    """A symbol with a zero-length table entry must latch bit 30 of the
    stream's bit count (the sampled-table uncodeable marker) without
    disturbing the low bits; streams without such symbols stay clean."""
    seg = 256
    datas = np.clip(RNG.normal(60, 4, size=(3, seg)), 0, 255).astype(np.uint8)
    lengths, vals = make_table(datas)
    hole = int(np.nonzero(lengths == 0)[0][-1])
    poisoned = datas.copy()
    poisoned[1, 17] = hole
    SW = max(96, -(-(seg + 128) // 128) * 32)
    _out, clean = sim_encode(datas[:, ::-1].copy(), lengths, vals, SW)
    _out, total = sim_encode(poisoned[:, ::-1].copy(), lengths, vals, SW)
    assert not (clean >> 30).any()
    assert (total[1] >> 30) & 1 == 1
    assert not (total[[0, 2]] >> 30).any()
    assert total[0] & 0x3FFFFFFF == clean[0]


def test_sim_encode_low_entropy():
    seg = 512
    datas = RNG.integers(0, 3, size=(5, seg), dtype=np.uint8)
    lengths, vals = make_table(datas)
    SW = 96
    out, total = sim_encode(datas[:, ::-1].copy(), lengths, vals, SW)
    for i in range(5):
        want = huf.encode_stream(datas[i], vals, lengths)
        nbytes = (int(total[i]) + 7) // 8
        got = out[i].astype("<u4").view(np.uint8)[:nbytes]
        assert np.array_equal(got, np.frombuffer(want, np.uint8)), i


@pytest.mark.tpu
def test_tpu_engine_shared_compress_parity():
    """engine='tpu' shared-table compress (Pallas encode path) must emit
    byte-identical containers to the numpy golden model."""
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs a real TPU")
    from zipnn_tpu import ZipNN

    rng = np.random.default_rng(7)
    n = 4 * 1024 * 1024 + 12345  # ragged tail chunk too
    vals = (rng.standard_normal(n // 2 + 1) * 0.05).astype(np.float32)
    data = ((vals.view(np.uint32) >> 16).astype(np.uint16)).tobytes()[:n]
    for chunk in (32768, 262144):  # Pallas path + XLA fallback (seg > 4096)
        ref = ZipNN(
            engine="numpy", huffman_table="shared", compression_chunk=chunk
        ).compress(data)
        got = ZipNN(
            engine="tpu", huffman_table="shared", compression_chunk=chunk
        ).compress(data)
        assert bytes(got) == bytes(ref), chunk


@pytest.mark.tpu
def test_tpu_plan_fast_encode_matches_numpy_spec():
    """Fused device compress (split + MXU hist + Pallas encode) must
    assemble a payload byte-identical to the numpy golden model."""
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs a real TPU")
    from zipnn_tpu import codec as host_codec
    from zipnn_tpu.ops import jax_codec

    rng = np.random.default_rng(7)
    n = 4 * 1024 * 1024
    vals = (rng.standard_normal(n // 2) * 0.05).astype(np.float32)
    data = np.frombuffer(
        ((vals.view(np.uint32) >> 16).astype(np.uint16)).tobytes()[:n], np.uint8
    )
    plan = jax_codec.plan_fast_encode(data, 2, 1, 10, 32768)
    assert plan is not None
    run, words_dev, assemble = plan
    payload = assemble(*run(words_dev))
    want = host_codec.compress_payload_numpy(
        data, 2, 1, 10, 32768, shared_tables=True
    )
    assert payload == bytes(want)


@pytest.mark.tpu
def test_tpu_batched_fused_encode():
    """GB-scale encode batching on hardware at small scale: 48 MB through
    16 MB batches (3 batches, real kernels, global sampled table) must
    match the numpy spec byte for byte."""
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs a real TPU")
    from zipnn_tpu import codec as host_codec
    from zipnn_tpu.ops import jax_codec

    rng = np.random.default_rng(17)
    n = 48 * 1024 * 1024 + 12345
    vals = (rng.standard_normal(n // 2 + 1) * 0.05).astype(np.float32)
    data = np.frombuffer(
        ((vals.view(np.uint32) >> 16).astype(np.uint16)).tobytes()[:n],
        np.uint8,
    )
    got = jax_codec.fast_encode_payload_batched(
        data, 2, 1, 10, 32768, batch_bytes=16 * 1024 * 1024
    )
    assert got is not None
    want = host_codec.compress_payload_numpy(
        data, 2, 1, 10, 32768, shared_tables=True
    )
    assert bytes(got.tobytes()) == want


@pytest.mark.tpu
def test_tpu_plan_fast_encode_sampled_profile():
    """>= 512 chunks: the sampled fused pipeline (sampled MXU histogram,
    const-scan kernel for RLE, encode-kernel bit-30 uncodeable flags)
    must match the numpy spec byte for byte — including an RLE cell on
    the hopeless mantissa plane and a cell whose rare byte the 1/8
    sample never saw."""
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs a real TPU")
    from zipnn_tpu import codec as host_codec
    from zipnn_tpu.ops import jax_codec

    rng = np.random.default_rng(11)
    chunk = 32768
    n_chunks = 520
    half = chunk // 2
    exp = np.clip(rng.normal(128, 3, (n_chunks, half)), 0, 255).astype(np.uint8)
    samp = exp[::8]
    rare = next(v for v in range(255, -1, -1) if v not in samp)
    exp[9, 7] = rare  # chunk 9 is not sampled -> uncodeable cell
    man = rng.integers(0, 256, (n_chunks, half), dtype=np.uint8)
    man[33] = 77  # RLE cell on the raw plane
    data = np.empty((n_chunks, half, 2), np.uint8)
    data[:, :, 0] = man
    data[:, :, 1] = exp
    data = data.reshape(-1)
    plan = jax_codec.plan_fast_encode(data, 2, 0, 10, chunk)
    assert plan is not None
    run, words_dev, assemble = plan
    payload = assemble(*run(words_dev))
    want = host_codec.compress_payload_numpy(
        data, 2, 0, 10, chunk, shared_tables=True
    )
    assert payload == bytes(want)
    types, _s, _d = host_codec.parse_tables(bytes(payload), 2, n_chunks)
    assert types[1, 9] == 0 and types[0, 33] == 1


@pytest.mark.tpu
def test_tpu_fp32_fused_paths():
    """fp32 (4-plane, mode 220) through fused device decode AND encode."""
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs a real TPU")
    from zipnn_tpu import ZipNN
    from zipnn_tpu.core.header import HEADER_LEN
    from zipnn_tpu.ops import jax_codec

    rng = np.random.default_rng(3)
    n = 8 * 1024 * 1024
    data = (rng.standard_normal(n // 4) * 0.05).astype(np.float32).tobytes()
    comp = ZipNN(
        engine="numpy", huffman_table="shared", compression_chunk=32768,
        bytearray_dtype="float32",
    ).compress(data)
    payload = np.frombuffer(comp, np.uint8)[HEADER_LEN:]

    plan = jax_codec.plan_fast_decode(payload, 4, 1, 220, 32768, len(data))
    assert plan is not None
    run, dev_args, _meta = plan
    owords, _p = run(*dev_args)
    got = np.ascontiguousarray(owords).astype("<u4").view(np.uint8)
    assert bytes(got.reshape(-1)[: len(data)]) == data

    plan_e = jax_codec.plan_fast_encode(
        np.frombuffer(data, np.uint8), 4, 1, 220, 32768
    )
    assert plan_e is not None
    run_e, words_dev, assemble = plan_e
    assert assemble(*run_e(words_dev)) == bytes(payload)


@pytest.mark.tpu
def test_tpu_encode_kernel():
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs a real TPU")
    seg = 512
    S = 2050
    datas = np.clip(RNG.normal(128, 6, size=(S, seg)), 0, 255).astype(np.uint8)
    lengths, vals = make_table(datas)
    tbl = pallas_huf_enc.pack_etable8(vals, lengths)
    rows, bits = pallas_huf_enc.encode_shared_table(datas[:, ::-1].copy(), tbl, seg)
    rows = np.asarray(rows)
    bits = np.asarray(bits)
    for i in range(0, S, 307):
        want = huf.encode_stream(datas[i], vals, lengths)
        nbytes = (int(bits[i]) + 7) // 8
        got = rows[i].astype("<u4").view(np.uint8)[:nbytes]
        assert np.array_equal(got, np.frombuffer(want, np.uint8)), i
