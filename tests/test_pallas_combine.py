"""pallas_combine: the fused per-chunk assembly kernel (decode back half).

Interpret-mode bit-exactness against a numpy model of the combine
semantics (reference csrc/data_manipulation_dtype16.c:167-216 interleave
+ :145-155 sign revert; assembly layout zipnn_core.c:821-852), across
source kinds (stored / RLE / per-cell-table Huffman d-pairs / shared
symbols), both num_buf widths the kernel supports, and both bit_reorder
values.  Hardware coverage: the @tpu fused-path tests exercise this
kernel end-to-end through ZipNN(engine="tpu").
"""
import numpy as np
import pytest

import jax.numpy as jnp

from zipnn_tpu.ops import pallas_combine


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


def run_case(nb, map_d, bit_reorder, B=9, PW=512, tlog=11, seed=1):
    rng = np.random.default_rng(seed)
    R = PW // 128
    n_st, n_rl, n_hf = 5, 3, 7
    G = n_hf
    if map_d:
        lo = rng.integers(0, 1 << tlog, size=(G, R, 256), dtype=np.uint32)
        hi = rng.integers(0, 1 << tlog, size=(G, R, 256), dtype=np.uint32)
        hsrc = (lo | (hi << 16)).astype(np.uint32)
        pages_sym = rng.integers(0, 256, size=(G, 1 << tlog), dtype=np.uint8)
        p = pages_sym.reshape(G, -1, 4).astype(np.uint32)
        pages = (
            p[:, :, 0] | (p[:, :, 1] << 8) | (p[:, :, 2] << 16)
            | (p[:, :, 3] << 24)
        )
    else:
        hsrc = rng.integers(0, 2**32, size=(G, R, 128), dtype=np.uint32)
        pages = None
    # payload tiles + per-stored-cell tile index / word shift / byte shift
    X = 64 + n_st * (R + 2)
    tiles = rng.integers(0, 2**32, size=(X, 128), dtype=np.uint32)
    st_tiles = rng.integers(0, X - (R + 1), size=(n_st,), dtype=np.int32)
    st_wsh = rng.integers(0, 128, size=(n_st,), dtype=np.int32)
    st_bsh = (rng.integers(0, 4, size=(n_st,), dtype=np.int32)) << 3
    rle_vals = rng.integers(0, 256, size=(n_rl,), dtype=np.uint8)
    perm = np.empty(B * nb, np.int32)
    for i in range(B * nb):
        kind = rng.integers(0, 3)
        if kind == 0:
            perm[i] = rng.integers(0, n_st)
        elif kind == 1:
            perm[i] = n_st + rng.integers(0, n_rl)
        else:
            perm[i] = n_st + n_rl + rng.integers(0, n_hf)

    def plane_row(pi):
        if pi < n_st:
            flat = tiles.reshape(-1)
            base = int(st_tiles[pi]) * 128 + int(st_wsh[pi])
            w = flat[base : base + PW + 1].astype(np.uint64)
            sh = int(st_bsh[pi])
            if sh == 0:
                return w[:PW].astype(np.uint32)
            return ((w[:PW] >> sh) | (w[1 : PW + 1] << (32 - sh))).astype(
                np.uint32
            )
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
            return np.ascontiguousarray(pages_sym[gi][d]).view(np.uint32)
        return hsrc[gi].reshape(-1)

    exp = np.empty((B, nb * PW), np.uint32)
    for c in range(B):
        if nb == 1:
            exp[c] = plane_row(perm[c])
        else:
            exp[c] = np_interleave2(
                plane_row(perm[c * nb]), plane_row(perm[c * nb + 1]),
                bit_reorder,
            )

    old = pallas_combine.INTERPRET
    pallas_combine.INTERPRET = True
    try:
        got = pallas_combine.combine_cells(
            jnp.asarray(hsrc), jnp.asarray(tiles), jnp.asarray(rle_vals),
            jnp.asarray(perm), jnp.asarray(st_tiles), jnp.asarray(st_wsh),
            jnp.asarray(st_bsh), B, nb, PW, n_st, n_rl, bit_reorder,
            pages=jnp.asarray(pages) if map_d else None, tlog_k=tlog,
        )
    finally:
        pallas_combine.INTERPRET = old
    np.testing.assert_array_equal(np.asarray(got), exp)


@pytest.mark.interpret
@pytest.mark.parametrize(
    "nb,map_d,bit_reorder,pw,tlog",
    [
        (2, True, 1, 512, 11),
        (2, True, 0, 512, 11),
        (2, False, 1, 512, 11),
        (1, True, 0, 256, 11),
        (1, False, 0, 256, 11),
        (2, True, 1, 256, 9),
        (2, True, 1, 128, 12),
    ],
)
def test_combine_cells_interpret(nb, map_d, bit_reorder, pw, tlog):
    run_case(nb, map_d, bit_reorder, PW=pw, tlog=tlog, seed=nb * 10 + tlog)


@pytest.mark.interpret
def test_combine_cells_segmented(monkeypatch):
    """B above the scalar-prefetch SMEM cap splits into equal padded
    segments (still one jit) — bit-identical to the single-call path."""
    monkeypatch.setattr(pallas_combine, "B_CAP", 4)
    run_case(2, True, 1, B=9, PW=256, tlog=11, seed=77)
    run_case(2, False, 0, B=11, PW=256, tlog=11, seed=78)


def test_combine_cells_rejects_fp32():
    with pytest.raises(ValueError):
        pallas_combine.combine_cells(
            jnp.zeros((1, 1, 128), jnp.uint32), jnp.zeros((8, 128), jnp.uint32),
            jnp.zeros((1,), jnp.uint8), jnp.zeros((4,), jnp.int32),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32), 1, 4, 128, 0, 0, 1,
        )
