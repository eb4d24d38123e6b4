"""Device-side byte-group transforms (JAX/XLA, TPU-first).

The byte-plane split/combine and sign-bit rotation of the ``.znn`` format
(reference csrc/data_manipulation_dtype16.c / dtype32.c) expressed as pure
uint32 lane arithmetic: every transform is a handful of shifts/masks that
XLA fuses into a single bandwidth-bound elementwise pass over HBM-resident
data — the TPU equivalent of the reference's scalar C loops.

Layout contract: one *full* chunk of ``chunk_size`` bytes is represented as
``chunk_size // 4`` uint32 words (little-endian byte order, matching a host
``np.view``).  Partial tail chunks are handled by the numpy golden model
(zipnn_tpu.ops.byte_group) on the host — device batches stay static-shaped.

Bit-exactness against the numpy model is enforced in tests/test_jax_engine.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_U = jnp.uint32


def _u32(x) -> jax.Array:
    return jnp.asarray(x, dtype=_U)


# ---------------------------------------------------------------------------
# sign-bit rotation (bit_reorder == 1), on uint32 words
# ---------------------------------------------------------------------------

def reorder_sign_16(words: jax.Array) -> jax.Array:
    """Two bf16 lanes per word: [s e8 m7] -> [e8 s m7] (dtype16.c:10-20)."""
    w = _u32(words)
    sign = (w >> _U(8)) & _U(0x800080)
    exp = (w << _U(1)) & _U(0xFF00FF00)
    man = w & _U(0x7F007F)
    return exp | sign | man


def revert_sign_16(words: jax.Array) -> jax.Array:
    """Inverse of :func:`reorder_sign_16` (dtype16.c:145-155)."""
    w = _u32(words)
    sign = (w << _U(8)) & _U(0x80008000)
    exp = (w >> _U(1)) & _U(0x7F807F80)
    man = w & _U(0x7F007F)
    return sign | exp | man


def reorder_sign_32(words: jax.Array) -> jax.Array:
    """fp32: [s e8 m23] -> [e8 s m23] per word (dtype32.c:39-49)."""
    w = _u32(words)
    sign = (w >> _U(8)) & _U(0x800000)
    exp = (w << _U(1)) & _U(0xFF000000)
    man = w & _U(0x7FFFFF)
    return exp | sign | man


def revert_sign_32(words: jax.Array) -> jax.Array:
    """Inverse of :func:`reorder_sign_32` (dtype32.c:275-285)."""
    w = _u32(words)
    sign = (w << _U(8)) & _U(0x80000000)
    exp = (w >> _U(1)) & _U(0x7F800000)
    man = w & _U(0x7FFFFF)
    return sign | exp | man


# ---------------------------------------------------------------------------
# byte-plane split / combine on full chunks
#
# words: [..., n_words] uint32; planes are returned packed 4-bytes-per-word
# as uint32 arrays of n_words/num_buf words per plane (full chunks only, so
# n_words % num_buf == 0 and plane byte counts are word-aligned for
# chunk_size % 16 == 0 — guaranteed: chunk_size is a power of two >= 64).
# ---------------------------------------------------------------------------

def _bytes_of(w: jax.Array):
    return (
        w & _U(0xFF),
        (w >> _U(8)) & _U(0xFF),
        (w >> _U(16)) & _U(0xFF),
        (w >> _U(24)) & _U(0xFF),
    )


def _pack4(b0, b1, b2, b3) -> jax.Array:
    return b0 | (b1 << _U(8)) | (b2 << _U(16)) | (b3 << _U(24))


def split_2(words: jax.Array, bit_reorder: int) -> jax.Array:
    """2-plane split of full chunks: [..., n] uint32 -> [..., 2, n//2] uint32.

    Plane 0 = even bytes (low bytes of each 16-bit lane), plane 1 = odd
    bytes, after optional sign rotation (dtype16.c:78-102).
    """
    w = _u32(words)
    if bit_reorder:
        w = reorder_sign_16(w)
    # strided lane slices, NOT a reshape to [..., n//2, 2]: a minor dim of 2
    # lane-pads to 128 if XLA materializes it (64x HBM inflation at scale)
    lo, hi = w[..., 0::2], w[..., 1::2]  # two consecutive words = 4 lanes
    b0, b1, b2, b3 = _bytes_of(lo)
    c0, c1, c2, c3 = _bytes_of(hi)
    p0 = _pack4(b0, b2, c0, c2)  # even bytes of 8 input bytes
    p1 = _pack4(b1, b3, c1, c3)  # odd bytes
    return jnp.stack([p0, p1], axis=-2)


def combine_2(planes: jax.Array, bit_reorder: int) -> jax.Array:
    """Inverse of :func:`split_2`: [..., 2, n//2] -> [..., n] uint32
    (dtype16.c:167-216)."""
    p = _u32(planes)
    p0, p1 = p[..., 0, :], p[..., 1, :]
    a0, a1, a2, a3 = _bytes_of(p0)
    b0, b1, b2, b3 = _bytes_of(p1)
    lo = _pack4(a0, b0, a1, b1)
    hi = _pack4(a2, b2, a3, b3)
    w = jnp.stack([lo, hi], axis=-1)
    *lead, n2, _ = w.shape
    w = w.reshape(*lead, n2 * 2)
    if bit_reorder:
        w = revert_sign_16(w)
    return w


def split_4(words: jax.Array, bit_reorder: int) -> jax.Array:
    """4-plane split (fp32 mode 220): [..., n] -> [..., 4, n//4] uint32
    (dtype32.c:78-102)."""
    w = _u32(words)
    if bit_reorder:
        w = reorder_sign_32(w)
    # strided lane slices (see split_2: minor-dim-4 reshape lane-pads 32x)
    cols = [w[..., i::4] for i in range(4)]  # 4 consecutive words = 16 bytes
    by = [_bytes_of(c) for c in cols]  # by[word][byte]
    planes = [
        _pack4(by[0][b], by[1][b], by[2][b], by[3][b]) for b in range(4)
    ]
    return jnp.stack(planes, axis=-2)


def combine_4(planes: jax.Array, bit_reorder: int) -> jax.Array:
    """Inverse of :func:`split_4` (dtype32.c:391-456)."""
    p = _u32(planes)
    by = [_bytes_of(p[..., b, :]) for b in range(4)]  # [plane][word_byte]
    words = [_pack4(by[0][i], by[1][i], by[2][i], by[3][i]) for i in range(4)]
    w = jnp.stack(words, axis=-1)
    *lead, n4, _ = w.shape
    w = w.reshape(*lead, n4 * 4)
    if bit_reorder:
        w = revert_sign_32(w)
    return w


def split_device(words: jax.Array, num_buf: int, byte_reorder: int, bit_reorder: int) -> jax.Array:
    """Dispatch: [..., n_words] -> [..., num_buf, n_words // num_buf]."""
    if num_buf == 1:
        if byte_reorder != 10:
            raise ValueError(f"Unsupported bytes_mode {byte_reorder} for 1 plane")
        return _u32(words)[..., None, :]
    if num_buf == 2:
        if byte_reorder != 10:
            raise ValueError(f"Unsupported bytes_mode {byte_reorder} for 2 planes")
        return split_2(words, bit_reorder)
    if num_buf == 4:
        if byte_reorder != 220:
            raise ValueError(f"Unsupported bytes_mode {byte_reorder} for 4 planes")
        return split_4(words, bit_reorder)
    raise ValueError(f"Unsupported num_buf {num_buf}")


def combine_device(planes: jax.Array, num_buf: int, byte_reorder: int, bit_reorder: int) -> jax.Array:
    """Dispatch: [..., num_buf, n//num_buf] -> [..., n] uint32."""
    if num_buf == 1:
        return _u32(planes)[..., 0, :]
    if num_buf == 2:
        if byte_reorder != 10:
            raise ValueError(f"Unsupported bytes_mode {byte_reorder} for 2 planes")
        return combine_2(planes, bit_reorder)
    if num_buf == 4:
        if byte_reorder != 220:
            raise ValueError(f"Unsupported bytes_mode {byte_reorder} for 4 planes")
        return combine_4(planes, bit_reorder)
    raise ValueError(f"Unsupported num_buf {num_buf}")


# ---------------------------------------------------------------------------
# width conversions without small-minor-dim layouts
#
# jax.lax.bitcast_convert_type between widths appends a minor dim (e.g.
# u8[N,4]); TPU layouts pad the minor dim to 128 lanes, silently inflating
# such arrays 32-64x in HBM.  These helpers convert through [X, 512]-byte
# rows with strided lane slices instead, which lay out tightly.
# ---------------------------------------------------------------------------

def u8_flat_to_u32(flat_u8):
    """uint8 [4N] -> uint32 [N] (little-endian), N*4 must be % 512 == 0."""
    b = flat_u8.reshape(-1, 512)
    w = (
        b[:, 0::4].astype(jnp.uint32)
        | (b[:, 1::4].astype(jnp.uint32) << 8)
        | (b[:, 2::4].astype(jnp.uint32) << 16)
        | (b[:, 3::4].astype(jnp.uint32) << 24)
    )
    return w.reshape(-1)


def u32_flat_to_u8(w):
    """uint32 [N] -> uint8 [4N] (little-endian), N must be % 128 == 0."""
    w = w.reshape(-1, 128)
    out = jnp.zeros((w.shape[0], 512), jnp.uint8)
    out = out.at[:, 0::4].set((w & 0xFF).astype(jnp.uint8))
    out = out.at[:, 1::4].set(((w >> 8) & 0xFF).astype(jnp.uint8))
    out = out.at[:, 2::4].set(((w >> 16) & 0xFF).astype(jnp.uint8))
    out = out.at[:, 3::4].set(((w >> 24) & 0xFF).astype(jnp.uint8))
    return out.reshape(-1)


def u32_flat_to_u16(w):
    """uint32 [N] -> uint16 [2N] (little-endian lanes), N % 128 == 0."""
    w = w.reshape(-1, 128)
    out = jnp.zeros((w.shape[0], 256), jnp.uint16)
    out = out.at[:, 0::2].set((w & 0xFFFF).astype(jnp.uint16))
    out = out.at[:, 1::2].set((w >> 16).astype(jnp.uint16))
    return out.reshape(-1)


def u8_flat_to_u16(flat_u8):
    """uint8 [2N] -> uint16 [N] (little-endian), 2N % 256 == 0."""
    b = flat_u8.reshape(-1, 256)
    w = b[:, 0::2].astype(jnp.uint16) | (b[:, 1::2].astype(jnp.uint16) << 8)
    return w.reshape(-1)
