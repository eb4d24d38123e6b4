"""Stage-level timing of the pc fused decode at 768 MB (dev tool).

Times each device stage of _fused_pc_decode separately (jit'd alone,
best-of-3 with a blocking sync) so kernel work is separable from the
fused pipeline's end-to-end wall. Run on the TPU rig.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402
from zipnn_tpu.ops import jax_decode, jax_transforms  # noqa: E402
from zipnn_tpu.ops import pallas_gather, pallas_huf_pc as pc  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timed(fn, *args, n=3):
    """Slope-timed per-call cost: K vs 2K back-to-back async calls with one
    terminal sync each — the difference cancels dispatch+sync fixed cost
    (~15-30 ms/round-trip on this tunnel rig)."""
    out = fn(*args)
    jax.block_until_ready(out)

    def run_k(k):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            o = None
            for _i in range(k):
                o = fn(*args)
            jax.block_until_ready(o)
            best = min(best, time.perf_counter() - t0)
        return best

    K = 3
    tK, t2K = run_k(K), run_k(2 * K)
    return max((t2K - tK) / K, 1e-9), out


def main():
    data = bench.synth_bf16(bench.SIZE)
    payload, _ = bench._pc_payload(data, "bfloat16")
    g = jax_decode._parse_geometry(payload, 2, bench.PC_CHUNK, len(data), 1, 10)
    plan = jax_decode._PCPlan.build(g)
    caps = jax_decode._batch_caps_range(g, 0, g.full)
    host, meta = jax_decode._batch_host(plan, 0, g.full, caps, g.full)
    tiles = jax_decode._tiles_call(plan.RT)(jnp.asarray(g.payload_np))
    dev = jax_decode._to_dev(plan, tiles, host)
    (tiles_d, row_starts, p0, cbnd, pages, st_tiles, st_wsh, st_bsh,
     rle_vals, perm) = dev
    _ = np.asarray(tiles_d[0, :1])

    SW = plan.SW
    seg = g.seg
    B = g.full
    n_st, n_rl, n_hf = caps
    S = n_hf * 4
    S_pad = -(-max(S, 1) // pc.BLOCK) * pc.BLOCK
    n_blocks = S_pad // pc.BLOCK
    RT = SW // 128
    plane_words = g.plane_bytes // 4
    print(f"SW={SW} seg={seg} B={B} caps={caps} S_pad={S_pad} "
          f"n_blocks={n_blocks} tlog_k={plan.tlog_k} rate12={plan.rate12}",
          flush=True)

    # stage 1: HUF row gather + transpose to blocks
    @jax.jit
    def s1a(tiles, row_starts):
        return pallas_gather.gather_rows(tiles, row_starts, RT)

    t1a, words = timed(s1a, tiles_d, row_starts)
    print(f"gather_rows:      {t1a*1e3:.1f} ms", flush=True)

    @jax.jit
    def s1b(words):
        return words.reshape(n_blocks, pc.SUBS, 128, SW).transpose(0, 3, 1, 2)

    t1b, blocks = timed(s1b, words)
    print(f"block transpose:  {t1b*1e3:.1f} ms", flush=True)
    t1 = t1a + t1b
    del words

    # stage 2: decode kernel
    kern = pc._decode_call(SW, seg, plan.tlog_k, n_blocks, plan.rate12)
    t2, (dw, pend) = timed(kern, p0, cbnd, blocks)
    print(f"decode kernel:    {t2*1e3:.1f} ms "
          f"({len(data)/1e9/t2:.2f} GB/s of output)", flush=True)

    # stage 3: post map (d->symbol) incl. the transpose/reshape feeding it
    @jax.jit
    def s3a(dw):
        return dw.transpose(0, 2, 3, 1).reshape(S_pad, seg // 2)

    t3a, dwS = timed(s3a, dw)
    print(f"dw transpose:     {t3a*1e3:.1f} ms", flush=True)
    del dw, blocks

    @jax.jit
    def s3b(dwS, pages):
        return pc.post_map_symbols(dwS, pages, seg, plan.tlog_k)

    t3b, ow = timed(s3b, dwS, pages)
    print(f"post kernel:      {t3b*1e3:.1f} ms", flush=True)
    t3 = t3a + t3b
    del dwS

    # stage 4: permutation gather, then combine
    @jax.jit
    def s4a(ow, perm):
        rows = ow[:S].reshape(n_hf, plane_words)
        return rows[perm].reshape(B, g.num_buf, plane_words)

    t4a, planes_words = timed(s4a, ow, perm)
    print(f"perm gather:      {t4a*1e3:.1f} ms", flush=True)
    del ow

    @jax.jit
    def s4b(planes_words):
        return jax_transforms.combine_device(
            planes_words, g.num_buf, g.byte_reorder, g.bit_reorder
        )

    t4b, owords = timed(s4b, planes_words)
    print(f"combine:          {t4b*1e3:.1f} ms", flush=True)
    t4 = t4a + t4b
    del planes_words, owords

    total = t1 + t2 + t3 + t4
    print(f"sum of stages:    {total*1e3:.1f} ms "
          f"({len(data)/1e9/total:.2f} GB/s)", flush=True)

    # whole fused call for comparison (slope-timed, then one-shot)
    run = plan.fused_call(caps, B)
    tf, _ = timed(lambda *a: run(*a), *dev)
    print(f"fused marginal:   {tf*1e3:.1f} ms "
          f"({len(data)/1e9/tf:.2f} GB/s)", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = run(*dev)
        jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    print(f"fused one-shot:   {best*1e3:.1f} ms "
          f"({len(data)/1e9/best:.2f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
