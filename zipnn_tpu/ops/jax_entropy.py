"""Device-side HUF entropy coding (JAX/XLA, TPU-first).

The ``.znn`` format's entropy layer is Huffman over 256-symbol byte planes,
framed as independent 4-stream blocks (see ops/entropy/huf.py for the format
and the scalar golden model).  Bitstream decode is inherently serial *per
stream*, so the TPU design exploits the format's massive stream parallelism:
every full 256 KB chunk contributes ``num_buf × 4`` independent backward
bitstreams of identical symbol count, and all of them advance in lockstep —
one ``lax.scan`` step decodes one symbol in every stream lane at once.

Per scan step and lane: a 2-word gather builds a 32-bit window at the lane's
bit cursor, the ``table_log``-bit peek indexes that lane's decode table
(one flat gather over all cells' tables), and the cursor retreats by the
entry's bit length.  No data-dependent shapes ever reach XLA: segment
lengths are static, tail chunks are handled on the host.

Encode is the mirror image and is *embarrassingly* parallel: per-lane code
lengths come from a table gather, bit positions from a cumulative sum, and
the variable-length codes are deposited into 32-bit words with a
``segment_sum`` (codes never overlap, so sum == or).

Equivalent of the reference's HUF_compress/HUF_decompress calls at
csrc/zipnn_core.c:366 and :807, re-architected for SIMD lockstep instead of
one-stream-at-a-time CPU decode.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_U = jnp.uint32
_I = jnp.int32


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("seg_len", "words_per_row"))
def decode_streams(
    words_flat: jax.Array,  # uint32 [S * words_per_row] padded stream words
    bits_left0: jax.Array,  # int32 [S] sentinel bit position per stream
    table_log: jax.Array,  # int32 [S]
    tbl_off: jax.Array,  # int32 [S] offset of this stream's dtable in dtable_flat
    dtable_flat: jax.Array,  # int32 [n_cells * 4096]: sym | (nb << 8)
    seg_len: int,
    words_per_row: int,
):
    """Lockstep-decode ``seg_len`` symbols from S independent HUF streams.

    Returns (symbols uint8 [S, seg_len], final bits_left int32 [S]).  A
    stream decoded exactly must end with ``bits_left == 0`` (checked by the
    caller, mirroring ops/entropy/huf.py decode_stream's final check).
    """
    S = bits_left0.shape[0]
    row_off = jnp.arange(S, dtype=_I) * words_per_row
    tl = table_log.astype(_I)
    words_flat = words_flat.astype(_U)
    dtable_flat = dtable_flat.astype(_I)

    def step(bits_left, _):
        lo = bits_left - tl
        lo2 = jnp.maximum(lo, 0)
        widx = row_off + (lo2 >> 5)
        w0 = words_flat[widx]
        w1 = words_flat[widx + 1]
        bo = (lo2 & 31).astype(_U)
        win = (w0 >> bo) | jnp.where(bo == 0, _U(0), w1 << (_U(32) - bo))
        navail = jnp.clip(bits_left - lo2, 0, 12).astype(_U)
        val = win & ((_U(1) << navail) - _U(1))
        idx = (val << (lo2 - lo).astype(_U)).astype(_I)
        entry = dtable_flat[tbl_off + idx]
        sym = (entry & 0xFF).astype(jnp.uint8)
        nb = entry >> 8
        return bits_left - nb, sym

    bits_left, syms = jax.lax.scan(step, bits_left0.astype(_I), None, length=seg_len)
    return syms.T, bits_left  # [S, seg_len]


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("seg_len", "words_per_row"))
def encode_streams(
    syms: jax.Array,  # uint8 [S, seg_len] symbols per stream
    nb_tbl: jax.Array,  # uint32 [n_cells * 256] code length per symbol
    val_tbl: jax.Array,  # uint32 [n_cells * 256] canonical code value
    cell_tbl_off: jax.Array,  # int32 [S] offset of this stream's cell tables
    seg_len: int,
    words_per_row: int,
):
    """Lockstep-encode S streams (symbols written in descending index order,
    then the closing sentinel bit — ops/entropy/huf.py encode_stream).

    Returns (words uint32 [S, words_per_row], total_bits int32 [S] incl.
    sentinel).  Byte length per stream = ceil(total_bits / 8).
    """
    S, _ = syms.shape
    rev = syms[:, ::-1].astype(_I)
    flat_idx = cell_tbl_off[:, None] + rev  # [S, seg_len]
    nb = nb_tbl[flat_idx.reshape(-1)].astype(_U).reshape(S, seg_len)
    val = val_tbl[flat_idx.reshape(-1)].astype(_U).reshape(S, seg_len)

    nb_i = nb.astype(_I)
    pos = jnp.cumsum(nb_i, axis=1) - nb_i  # exclusive prefix sum, [S, seg_len]
    payload_bits = pos[:, -1] + nb_i[:, -1]
    total_bits = payload_bits + 1  # sentinel

    word_in_row = pos >> 5
    bit_off = (pos & 31).astype(_U)
    lo = val << bit_off  # uint32 wraps == & 0xFFFFFFFF
    hi = jnp.where(bit_off == 0, _U(0), val >> (_U(32) - bit_off))

    row_base = (jnp.arange(S, dtype=_I) * words_per_row)[:, None]
    ids_lo = (row_base + word_in_row).reshape(-1)
    ids_hi = (row_base + word_in_row + 1).reshape(-1)

    # sentinel bit at payload_bits
    sent_ids = row_base[:, 0] + (payload_bits >> 5)
    sent_val = _U(1) << (payload_bits & 31).astype(_U)

    num_words = S * words_per_row
    ids = jnp.concatenate([ids_lo, ids_hi, sent_ids])
    vals = jnp.concatenate([lo.reshape(-1), hi.reshape(-1), sent_val])
    words = jax.ops.segment_sum(vals, ids, num_segments=num_words)
    return words.reshape(S, words_per_row), total_bits


# ---------------------------------------------------------------------------
# histogram (per cell, for encode table building)
# ---------------------------------------------------------------------------

@jax.jit
def histogram_cells(data: jax.Array) -> jax.Array:
    """Per-row byte histogram: uint8 [C, N] -> int32 [C, 256].

    The TPU equivalent of the reference's per-chunk ``hist`` pass feeding
    HUF_compress — but as MXU work, not a scatter: one-hot the two nibbles
    of every byte (int8: XLA *CPU* emulates bf16 matmuls an order of
    magnitude slower, and this function also serves the CPU mesh paths)
    and batch-matmul them, so
    ``hist[c, 16*i + j] = #{n : hi(data[c,n])==i and lo(data[c,n])==j}``.
    A segment_sum scatter lowers to serial updates on TPU (~0.1 GB/s); this
    runs 47x faster, chunked over cells to bound the one-hot slabs.  The
    TPU fused encode uses :func:`histogram_rows_words` (bf16, position-
    packed) instead.
    """
    C, N = data.shape
    grp = max(1, min(C, (4 << 20) // max(N, 1)))
    Cp = -(-C // grp) * grp
    x = data
    if Cp != C:
        x = jnp.concatenate([data, jnp.zeros((Cp - C, N), jnp.uint8)])
    x = x.reshape(Cp // grp, grp, N)
    iota = jnp.arange(16, dtype=jnp.uint8)

    def step(_, rows):
        hi = ((rows >> 4)[..., None] == iota).astype(jnp.int8)
        lo = ((rows & 15)[..., None] == iota).astype(jnp.int8)
        h = jnp.einsum(
            "cni,cnj->cij", hi, lo, preferred_element_type=_I
        )
        return None, h

    _, hs = jax.lax.scan(step, None, x)
    return hs.reshape(Cp, 256)[:C]


def histogram_rows_words(words: jax.Array) -> jax.Array:
    """Per-row byte histogram from uint32 words: [R, W] -> int32 [R, 256].

    Byte-POSITION-packed variant of :func:`histogram_cells`: the MXU's
    floor for these histograms is the tiny-matmul shape (a 16x16 output
    uses 1.5% of the array), so the four byte positions of each word are
    packed into the M/N dims — one [64, W] x [W, 64] dot per row, 25%
    utilization, with the wanted per-position 16x16 blocks on the diagonal
    (off-diagonal cross terms ride along free).  ~2x faster than the
    per-byte nibble formulation at 768 MB.
    """
    R, W = words.shape
    grp = max(1, min(R, (1 << 20) // max(W, 1)))
    Rp = -(-R // grp) * grp
    x = words
    if Rp != R:
        x = jnp.concatenate([words, jnp.zeros((Rp - R, W), jnp.uint32)])
    x = x.reshape(Rp // grp, grp, W)
    iota = jnp.arange(16, dtype=jnp.uint8)

    def step(_, rows):  # [G, W] uint32
        his = []
        los = []
        for p in range(4):
            b = ((rows >> jnp.uint32(8 * p)) & jnp.uint32(0xFF)).astype(jnp.uint8)
            his.append(((b >> 4)[..., None] == iota).astype(jnp.bfloat16))
            los.append(((b & 15)[..., None] == iota).astype(jnp.bfloat16))
        A = jnp.concatenate(his, axis=2)  # [G, W, 64] (16p + hi)
        B = jnp.concatenate(los, axis=2)  # [G, W, 64] (16p + lo)
        out = jnp.einsum(
            "cwi,cwj->cij", A, B, preferred_element_type=jnp.float32
        )  # [G, 64, 64]
        o = out.reshape(-1, 4, 16, 4, 16)
        h = (
            o[:, 0, :, 0, :] + o[:, 1, :, 1, :]
            + o[:, 2, :, 2, :] + o[:, 3, :, 3, :]
        )
        return None, h.astype(_I).reshape(-1, 256)

    _, hs = jax.lax.scan(step, None, x)
    return hs.reshape(Rp, 256)[:R]


# ---------------------------------------------------------------------------
# host-side batch prep (numpy)
# ---------------------------------------------------------------------------

def pack_streams_np(streams, words_per_row: int) -> np.ndarray:
    """Pack per-stream byte blobs into a [S, words_per_row] uint32 matrix
    (little-endian), zero-padded.  +1 guard word is the caller's job (use a
    words_per_row one larger than the longest stream needs)."""
    S = len(streams)
    out = np.zeros((S, words_per_row * 4), dtype=np.uint8)
    for i, s in enumerate(streams):
        b = np.frombuffer(s, dtype=np.uint8)
        out[i, : b.size] = b
    return out.view("<u4").reshape(S, words_per_row)


def sentinel_bits(stream: bytes) -> int:
    """Bit position of the closing sentinel (= payload bit count)."""
    last = stream[-1]
    if last == 0:
        raise ValueError("corrupt bitstream: missing sentinel bit")
    return 8 * (len(stream) - 1) + (last.bit_length() - 1)
