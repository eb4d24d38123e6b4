"""Isolate the batched-decode overhead vs the single-dispatch path.

Round-4 bench: tpu_pc (768 MB, ONE dispatch) = 14.85 GB/s HBM but
tpu_pc_batched (1536 MB, 3 x 512 MB batches) = 5.80 GB/s — 2.6x slower
per byte.  This script decodes the SAME container both ways at a smaller
size (default 384 MB, 3 x 128 MB batches) and times each stage.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MB = 1 << 20
SIZE = int(os.environ.get("PB_MB", "384")) * MB
BATCH_MB = int(os.environ.get("ZIPNN_TPU_BATCH_MB", "128"))
PC_CHUNK = 256 * 1024

from zipnn_tpu import ZipNN  # noqa: E402
from zipnn_tpu.core.header import HEADER_LEN  # noqa: E402
from zipnn_tpu.ops import jax_decode  # noqa: E402


def synth_bf16(nbytes: int) -> bytes:
    rng = np.random.default_rng(7)
    out = []
    for off in range(0, nbytes, 64 * MB):
        n = min(64 * MB, nbytes - off)
        vals = (rng.standard_normal(n // 2) * 0.05).astype(np.float32)
        out.append(((vals.view(np.uint32) >> 16).astype(np.uint16)).tobytes()[:n])
    return b"".join(out)


def main():
    import jax.numpy as jnp

    data = synth_bf16(SIZE)
    comp = ZipNN(compression_chunk=PC_CHUNK, engine="native").compress(data)
    payload = np.frombuffer(memoryview(comp), np.uint8)[HEADER_LEN:].copy()

    g = jax_decode._parse_geometry(payload, 2, PC_CHUNK, SIZE, 1, 10)
    plan = jax_decode._PCPlan.build(g)
    assert plan is not None

    t0 = time.perf_counter()
    tiles = jax_decode.upload_tiles(plan, g)
    _ = np.asarray(tiles[0, :1])
    print(f"upload: {time.perf_counter() - t0:.2f}s", flush=True)

    # ---- single dispatch (the tpu_pc measurement) ----
    caps1 = jax_decode._batch_caps_range(g, 0, g.full)
    host1, meta1 = jax_decode._batch_host(plan, 0, g.full, caps1, g.full)
    dev1 = jax_decode._to_dev(plan, tiles, host1)
    run1 = plan.fused_call(caps1, g.full)
    owords, pend = run1(*dev1)
    _ = np.asarray(pend[:1])
    best1 = min(
        _time1(run1, dev1) for _ in range(5)
    )
    print(f"single-dispatch: {best1*1e3:.1f} ms  "
          f"{SIZE/1e9/best1:.2f} GB/s", flush=True)

    # steady-state: K back-to-back dispatches, ONE sync at the end.  The
    # synced loop above pays the tunnel's ~30 ms dispatch+fetch round trip
    # INSIDE every iteration; serving loads pipeline dispatches, so the
    # per-container device cost is (wall - RTT) / K.
    K = 6
    for _rep in range(3):
        t0 = time.perf_counter()
        pends = []
        for _i in range(K):
            _ow, pend = run1(*dev1)
            pends.append(pend)
        _ = np.asarray(pends[-1][:1])
        wall = time.perf_counter() - t0
        print(f"pipelined x{K}: {wall*1e3:.1f} ms total, "
              f"{wall/K*1e3:.2f} ms/iter  {K*SIZE/1e9/wall:.2f} GB/s",
              flush=True)

    # same but as_u8=True (what the batched path uses)
    run1u = plan.fused_call(caps1, g.full, as_u8=True)
    owords, pend = run1u(*dev1)
    _ = np.asarray(pend[:1])
    best1u = min(_time1(run1u, dev1) for _ in range(5))
    print(f"single-dispatch as_u8: {best1u*1e3:.1f} ms  "
          f"{SIZE/1e9/best1u:.2f} GB/s", flush=True)

    # ---- batched ----
    staged, staged_bytes = jax_decode.stage_dev_batches(plan, g, tiles)
    B, batches, caps = jax_decode._plan_batches(plan, g)
    print(f"batched: B={B} n_batches={len(batches)} caps={caps} "
          f"(single caps={caps1})", flush=True)

    runB = plan.fused_call(caps, B, as_u8=True)

    # (a) time ONE batch dispatch alone, synced
    lo, hi = batches[0]
    _h, _m, devb = staged[lo]
    ow, pend = runB(*devb)
    _ = np.asarray(pend[:1])
    bestb = min(_time1(runB, devb) for _ in range(5))
    bb = (hi - lo) * PC_CHUNK
    print(f"one batch synced: {bestb*1e3:.1f} ms  {bb/1e9/bestb:.2f} GB/s",
          flush=True)

    # (b) all batches, submit all then sync once (no finish/concat/pends)
    def run_all_nosync():
        t0 = time.perf_counter()
        outs = []
        for lo, hi in batches:
            _h, _m, devb = staged[lo]
            ow, pend = runB(*devb)
            outs.append((ow, pend))
        for ow, pend in outs:
            ow.block_until_ready()
        return time.perf_counter() - t0

    w = run_all_nosync()
    best_all = min(run_all_nosync() for _ in range(3))
    print(f"all batches, no finish: {best_all*1e3:.1f} ms  "
          f"{SIZE/1e9/best_all:.2f} GB/s", flush=True)

    # (c) the full production path (what the bench times)
    def run_full():
        t0 = time.perf_counter()
        defer = []
        fin = jax_decode._start_fast(
            plan, g, np.empty(0, np.uint8), True,
            tiles=tiles, staged=staged, defer=defer,
        )
        flat = fin()
        jax_decode.fetch_pends(defer)
        for e in defer:
            jax_decode.check_deferred_entry(e)
        _ = np.asarray(flat.reshape(-1)[:1])
        return time.perf_counter() - t0

    w = run_full()
    best_full = min(run_full() for _ in range(3))
    print(f"full batched path: {best_full*1e3:.1f} ms  "
          f"{SIZE/1e9/best_full:.2f} GB/s", flush=True)

    # (d) concat cost alone
    flats = []
    for lo, hi in batches:
        _h, _m, devb = staged[lo]
        ow, _p = runB(*devb)
        flats.append(ow[: (hi - lo) * PC_CHUNK])
    for f in flats:
        f.block_until_ready()
    t0 = time.perf_counter()
    cat = jnp.concatenate(flats)
    cat.block_until_ready()
    print(f"concat: {(time.perf_counter() - t0)*1e3:.1f} ms", flush=True)

    # (e) fetch_pends RPC cost
    defer = []
    fin = jax_decode._start_fast(
        plan, g, np.empty(0, np.uint8), True,
        tiles=tiles, staged=staged, defer=defer,
    )
    flat = fin()
    flat.block_until_ready()
    t0 = time.perf_counter()
    jax_decode.fetch_pends(defer)
    print(f"fetch_pends: {(time.perf_counter() - t0)*1e3:.1f} ms", flush=True)


def _time1(run, dev):
    t0 = time.perf_counter()
    ow, pend = run(*dev)
    _ = np.asarray(pend[:1])
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
