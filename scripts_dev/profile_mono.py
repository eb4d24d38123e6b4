"""Slope-time the mono-assembly kernel + new fused pipeline at 768 MB."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402
from zipnn_tpu.ops import jax_decode, pallas_combine  # noqa: E402
from zipnn_tpu.ops import pallas_gather, pallas_huf_pc as pc  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timed(fn, *args, n=3, K=3):
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

    SW, seg, B = plan.SW, g.seg, g.full
    n_st, n_rl, n_hf = caps
    S = n_hf * 4
    S_pad = -(-max(S, 1) // pc.BLOCK) * pc.BLOCK
    n_blocks = S_pad // pc.BLOCK
    RT = SW // 128
    PW = g.plane_bytes // 4
    R = PW // 128
    rtp = PW // 128 + 2
    print(f"B={B} caps={caps} R={R} tlog={plan.tlog_k}", flush=True)

    # build mono inputs once
    @jax.jit
    def front2(tiles, row_starts, p0, cbnd, st_tiles, st_wsh, st_bsh):
        srows = pallas_gather.gather_rows(tiles, st_tiles, rtp)
        srows = pallas_gather.align_rows(srows, st_wsh, st_bsh)
        words = pallas_gather.gather_rows(tiles, row_starts, RT)
        blocks = words.reshape(n_blocks, pc.SUBS, 128, SW).transpose(0, 3, 1, 2)
        kern = pc._decode_call(SW, seg, plan.tlog_k, n_blocks, plan.rate12)
        dw, pend = kern(p0, cbnd, blocks)
        dwS = dw.transpose(0, 2, 3, 1).reshape(S_pad, seg // 2)
        return dwS.reshape(S_pad // 4, R, 256), srows.reshape(n_st, rtp - 1, 128), pend

    tfront, (hsrc, ssrc, pend) = timed(
        front2, tiles_d, row_starts, p0, cbnd, st_tiles, st_wsh, st_bsh
    )
    print(f"front (gathers+decode+transposes): {tfront*1e3:.1f} ms", flush=True)

    @jax.jit
    def mono(hsrc, ssrc, rle_vals, perm, pages):
        return pallas_combine.combine_cells(
            hsrc, ssrc, rle_vals, perm, B, 2, PW, n_st, n_rl, 1,
            pages=pages, tlog_k=plan.tlog_k,
        )

    tmono, owords = timed(mono, hsrc, ssrc, rle_vals, perm, pages)
    print(f"mono assembly: {tmono*1e3:.1f} ms", flush=True)

    run = plan.fused_call(caps, B)
    tf, _ = timed(lambda *a: run(*a), *dev)
    print(f"fused marginal: {tf*1e3:.1f} ms ({len(data)/1e9/tf:.2f} GB/s)",
          flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = run(*dev)
        jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    print(f"fused one-shot: {best*1e3:.1f} ms ({len(data)/1e9/best:.2f} GB/s)",
          flush=True)


if __name__ == "__main__":
    main()
