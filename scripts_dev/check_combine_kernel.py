"""CPU interpret-mode validation of pallas_combine against a numpy model."""
import sys

import numpy as np

sys.path.insert(0, ".")

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax.numpy as jnp  # noqa: E402

from zipnn_tpu.ops import pallas_combine  # noqa: E402

pallas_combine.INTERPRET = True

rng = np.random.default_rng(0)


def np_revert16(w):
    sign = (w << 8) & 0x80008000
    exp = (w >> 1) & 0x7F807F80
    man = w & 0x007F007F
    return (sign | exp | man).astype(np.uint32)


def np_interleave2(p0, p1, bit_reorder):
    a = [(p0 >> (8 * i)) & 0xFF for i in range(4)]
    b = [(p1 >> (8 * i)) & 0xFF for i in range(4)]
    lo = a[0] | (b[0] << 8) | (a[1] << 16) | (b[1] << 24)
    hi = a[2] | (b[2] << 8) | (a[3] << 16) | (b[3] << 24)
    out = np.empty(2 * p0.size, np.uint32)
    out[0::2] = lo
    out[1::2] = hi
    if bit_reorder:
        out = np_revert16(out)
    return out


def case(nb, map_d, bit_reorder, B=9, PW=512, tlog=11, seed=1):
    rng = np.random.default_rng(seed)
    R = PW // 128
    n_st, n_rl = 5, 3
    n_hf = 7
    G = n_hf
    # sources
    if map_d:
        hsrc = rng.integers(0, 1 << tlog, size=(G, R, 256), dtype=np.uint32)
        hsrc = (hsrc | (rng.integers(0, 1 << tlog, size=(G, R, 256),
                                     dtype=np.uint32) << 16)).astype(np.uint32)
        pages_sym = rng.integers(0, 256, size=(G, 1 << tlog), dtype=np.uint8)
        p = pages_sym.reshape(G, -1, 4).astype(np.uint32)
        pages = (p[:, :, 0] | (p[:, :, 1] << 8) | (p[:, :, 2] << 16)
                 | (p[:, :, 3] << 24))
    else:
        hsrc = rng.integers(0, 2**32, size=(G, R, 128), dtype=np.uint32)
        pages = None
    rtp = R + 2
    ssrc = rng.integers(0, 2**32, size=(max(n_st, 1), rtp, 128),
                        dtype=np.uint32)
    rle_vals = rng.integers(0, 256, size=(max(n_rl, 1),), dtype=np.uint8)
    # perm: each (chunk, plane) picks a random kind
    perm = np.empty(B * nb, np.int32)
    for i in range(B * nb):
        kind = rng.integers(0, 3)
        if kind == 0:
            perm[i] = rng.integers(0, n_st)
        elif kind == 1:
            perm[i] = n_st + rng.integers(0, n_rl)
        else:
            perm[i] = n_st + n_rl + rng.integers(0, n_hf)

    # numpy expected
    def plane_row(pi):
        if pi < n_st:
            return ssrc[pi, :R, :].reshape(-1)
        if pi < n_st + n_rl:
            v = np.uint32(rle_vals[pi - n_st])
            v = v | (v << 8) | (v << 16) | (v << 24)
            return np.full(PW, v, np.uint32)
        gi = pi - n_st - n_rl
        if map_d:
            dw = hsrc[gi].reshape(-1)
            d = np.empty(2 * dw.size, np.uint32)
            d[0::2] = dw & 0xFFFF
            d[1::2] = dw >> 16
            syms = pages_sym[gi][d]
            return syms.view(np.uint32) if syms.flags.c_contiguous else None
        return hsrc[gi].reshape(-1)

    exp = np.empty((B, nb * PW), np.uint32)
    for c in range(B):
        if nb == 1:
            exp[c] = plane_row(perm[c])
        else:
            p0 = plane_row(perm[c * nb + 0])
            p1 = plane_row(perm[c * nb + 1])
            exp[c] = np_interleave2(p0, p1, bit_reorder)

    got = pallas_combine.combine_cells(
        jnp.asarray(hsrc), jnp.asarray(ssrc), jnp.asarray(rle_vals),
        jnp.asarray(perm), B, nb, PW, n_st, n_rl, bit_reorder,
        pages=jnp.asarray(pages) if map_d else None, tlog_k=tlog,
    )
    got = np.asarray(got)
    ok = np.array_equal(got, exp)
    print(f"nb={nb} map_d={map_d} bit_reorder={bit_reorder}: "
          f"{'OK' if ok else 'MISMATCH'}")
    if not ok:
        bad = np.nonzero(got != exp)
        print("first bad:", bad[0][:5], bad[1][:5])
        c, j = int(bad[0][0]), int(bad[1][0])
        print(f"got {got[c, j]:08x} want {exp[c, j]:08x} perm "
              f"{perm[c*nb:(c+1)*nb]}")
        sys.exit(1)


case(2, True, 1)
case(2, True, 0)
case(2, False, 1)
case(1, True, 0, PW=256)
case(1, False, 0, PW=256)
case(2, True, 1, tlog=9, PW=256)
print("all ok")
