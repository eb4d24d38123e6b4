"""Stacked multi-shard decode (ops/jax_decode.build_stacked + io.serving).

CPU: host-side remap invariants of build_stacked (the offset arithmetic
is where a stacking bug would corrupt silently).  Hardware (@tpu): the
one-dispatch stacked decode is byte-identical to per-shard decodes.
"""
import numpy as np
import pytest

from zipnn_tpu import ZipNN
from zipnn_tpu.core.header import HEADER_LEN
from zipnn_tpu.ops import jax_decode


def _payload(data, chunk=262144):
    comp = bytes(
        ZipNN(engine="numpy", compression_chunk=chunk).compress(data)
    )
    return np.frombuffer(memoryview(comp), np.uint8)[HEADER_LEN:].copy()


def _shard(nbytes, seed, chunk=262144):
    rng = np.random.default_rng(seed)
    n = nbytes // 2
    data = (
        (rng.integers(120, 140, size=n, dtype=np.uint16) << 7)
        | rng.integers(0, 128, size=n, dtype=np.uint16)
    ).tobytes()
    payload = _payload(data, chunk)
    g = jax_decode._parse_geometry(payload, 2, chunk, len(data), 1, 10)
    plan = jax_decode._PCPlan.build(g)
    return data, g, plan


def test_build_stacked_remap_invariants():
    import jax.numpy as jnp

    items = []
    datas = []
    for seed in (1, 2, 3):
        data, g, plan = _shard(3 * 1024 * 1024, seed)
        assert plan is not None
        tiles = jnp.zeros(
            (plan.RT + (g.payload_np.size + 511) // 512 + plan.RT, 128),
            jnp.uint32,
        )
        items.append((plan, g, tiles))
        datas.append(data)
    stk = jax_decode.build_stacked(items)
    assert stk is not None
    NS, NR, NH = stk.caps
    perm = np.asarray(stk.dev[-1])
    assert perm.shape == (stk.B_tot * 2,)
    # every perm entry lands in exactly one source domain
    assert perm.min() >= 0
    assert perm.max() < NS + NR + NH
    # stored sources index the concatenated st_tiles
    stt = np.asarray(stk.dev[5])
    assert stt.shape[0] == NS
    # huf group sources stay within the stacked padded group count
    hsel = perm >= NS + NR
    assert (perm[hsel] - NS - NR).max() < NH
    # per-shard offsets are monotone and BLOCK-group aligned
    assert stk.B_offs == sorted(stk.B_offs)
    for off in stk.S_offs:
        assert off % 4 == 0
    # single shard / mixed geometry refuse to stack
    assert jax_decode.build_stacked(items[:1]) is None
    data4, g4, plan4 = _shard(3 * 1024 * 1024, 9, chunk=131072)
    import jax.numpy as jnp2

    t4 = jnp2.zeros((64, 128), jnp2.uint32)
    assert jax_decode.build_stacked(items[:2] + [(plan4, g4, t4)]) is None


@pytest.mark.tpu
def test_stacked_decode_matches_per_shard_tpu():
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs TPU hardware")
    from zipnn_tpu.io.serving import ShardDecoder

    rng = np.random.default_rng(5)
    blobs, datas = [], []
    for seed in (10, 11, 12):
        n = (3 * 1024 * 1024 + seed * 4096) // 2
        data = (
            (rng.integers(118, 142, size=n, dtype=np.uint16) << 7)
            | rng.integers(0, 128, size=n, dtype=np.uint16)
        ).tobytes()
        blobs.append(bytes(ZipNN(engine="native").compress(data)))
        datas.append(data)
    dec = ShardDecoder(to_device=True)
    staged = [dec.stage(b) for b in blobs]
    assert all(s is not None for s in staged)
    outs = dec.decompress_stacked(staged)
    assert outs is not None and len(outs) == 3
    for out, data in zip(outs, datas):
        assert out.tobytes() == data  # DeviceWords -> host bytes


def test_build_stacked_hbm_budget_gate(monkeypatch):
    """A stacked dispatch past the per-dispatch batch budget must be
    refused: 8 x 237 MB in one dispatch (~14 GB working set) measured
    2.2 GB/s on a 16 GB v5e vs pipelined bundles at 8+ GB/s."""
    import jax.numpy as jnp

    items = []
    for seed in (1, 2):
        data, g, plan = _shard(1 << 20, seed)
        assert plan is not None
        tiles = jnp.zeros((4, 128), jnp.uint32)  # tiles unused by the gate
        items.append((plan, g, tiles))
    monkeypatch.setattr(jax_decode, "_max_batch_chunks", lambda cs: 1)
    assert jax_decode.build_stacked(items) is None


def test_decompress_all_groups_staged_shards(monkeypatch):
    """decompress_all fuses consecutive same-geometry staged shards into
    stacked bundles under the batch budget (one run_stacked per bundle,
    outputs in order).  The device layer is mocked at the jax_decode
    seams — the real stacked kernels run in the @tpu twin
    (test_stacked_decode_matches_per_shard_tpu)."""
    from types import SimpleNamespace

    from zipnn_tpu.io import serving
    from zipnn_tpu.io.serving import ShardDecoder

    def mk_shard(i):
        st = serving._StagedShard()
        st.hdr = SimpleNamespace(original_len=1024)
        st.plan = SimpleNamespace(kind="pc", tag=i)
        st.g = SimpleNamespace(chunk_size=262144, full=4)
        st.tiles = None
        st.batches = {}
        st.upload_bytes = 0
        st.tail_dev = None
        return st

    staged = [mk_shard(i) for i in range(4)]
    monkeypatch.setattr(jax_decode, "_stack_key", lambda p, g: "K")
    monkeypatch.setattr(
        jax_decode, "_plan_batches", lambda p, g: (256, [(0, g.full)], (0, 0, 0))
    )
    monkeypatch.setattr(jax_decode, "_max_batch_chunks", lambda cs: 512)

    built = []

    def fake_build(items):
        built.append(len(items))
        return ("STK", items)

    clean_meta = {
        "S_real": 0, "rate12": False,
        "end_in_row": np.zeros(0, np.int64), "slens": np.zeros(0, np.int64),
        "cells": (np.zeros(0, np.int64), np.zeros(0, np.int64)),
    }

    def fake_run(stk, to_device, defer=None, tail_devs=None):
        _tag, items = stk
        outs = []
        for k, (plan, g, _t) in enumerate(items):
            defer.append(
                {"pend_np": np.zeros(0, np.int32), "meta": dict(clean_meta),
                 "plan": plan, "g": g, "lo": 0, "hi": g.full,
                 "to_device": to_device}
            )
            outs.append(("OUT", plan.tag))
        return outs

    monkeypatch.setattr(jax_decode, "build_stacked", fake_build)
    monkeypatch.setattr(jax_decode, "run_stacked", fake_run)
    monkeypatch.setattr(jax_decode, "fetch_pends", lambda e, drain=None: None)

    dec = ShardDecoder(to_device=True)
    outs = dec.decompress_all(staged)
    assert built == [2, 2]  # bundles of two under the 512-chunk budget
    assert [o[1] for o in outs] == [0, 1, 2, 3]  # order preserved

    # a stack_groups plan replays with NO bundle rebuilds (stage-time
    # work happens once; decompress_groups is the hot path)
    groups = dec.stack_groups(staged)
    assert built == [2, 2, 2, 2]
    for _rep in range(2):
        outs = dec.decompress_groups(groups)
        assert [o[1] for o in outs] == [0, 1, 2, 3]
    assert built == [2, 2, 2, 2]  # unchanged: replay built nothing
