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
# width conversions
#
# Three v5e-measured rules shape everything here (scripts_dev/profile_u8.py):
#
# 1. ``lax.bitcast_convert_type`` to a narrower type appends a minor axis
#    whose element i carries bits [8i, 8(i+1)) — little-endian byte order on
#    both the CPU and TPU backends (pinned by
#    tests/test_jax_engine.py::test_word_width_bitcasts_little_endian and its
#    @tpu twin).  MERGING that minor axis into the previous one
#    (``.reshape(*s[:-1], s[-1]*k)``) is cheap (~35 GB/s of output bytes);
#    XLA fuses bitcast+merge into one copy and the padded [..., k]
#    intermediate (minor dim k padded to 128 lanes = 32-64x HBM inflation)
#    never materializes.
# 2. Any OTHER sub-32-bit relayout — flattening u8/u16 to 1-D, reshaping
#    u16 across row boundaries — lowers to a ~4 GB/s copy.  Reshape in the
#    32-bit domain (u32 relayouts run at HBM rate), bitcast-merge last.
# 3. Float-typed relayouts (reshape/slice of bf16 arrays, u16->bf16
#    bitcasts) CANONICALIZE on TPU: NaN payloads collapse to 0x7FC0 and
#    bf16 denormals flush to zero.  fp32 is exact everywhere; fp16 is exact
#    except NaN payloads.  Keep bytes integer-typed through every shape op
#    and retype as the LAST op, guarded by :func:`hazard_scan` (see
#    :func:`words_to_typed`).
# ---------------------------------------------------------------------------

def bitcast_merge(w, dtype):
    """Bitcast ``w`` to a narrower ``dtype``, merging the appended minor
    axis into the last dimension (rule 1 above): uint32 [..., N] ->
    dtype [..., N*k], little-endian lane order."""
    import jax  # noqa: PLC0415

    y = jax.lax.bitcast_convert_type(w, dtype)
    if y.ndim == w.ndim:  # same-width bitcast: no minor axis appended
        return y
    return y.reshape(*w.shape[:-1], w.shape[-1] * y.shape[-1])

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
    """uint32 [N] -> uint8 [4N] (little-endian), N % 128 == 0.

    Prefer :func:`bitcast_merge` on a 2-D word view when the consumer can
    take rows: the final flatten here is a sub-32-bit relayout (rule 2) and
    costs ~4 GB/s — it is the single most expensive op in this module.
    """
    return bitcast_merge(w.reshape(-1, 128), jnp.uint8).reshape(-1)


def u32_flat_to_u16(w):
    """uint32 [N] -> uint16 [2N] (little-endian lanes), N % 128 == 0.

    Same flatten caveat as :func:`u32_flat_to_u8`."""
    return bitcast_merge(w.reshape(-1, 128), jnp.uint16).reshape(-1)


def u8_flat_to_u16(flat_u8):
    """uint8 [2N] -> uint16 [N] (little-endian), 2N % 256 == 0."""
    b = flat_u8.reshape(-1, 256)
    w = b[:, 0::2].astype(jnp.uint16) | (b[:, 1::2].astype(jnp.uint16) << 8)
    return w.reshape(-1)


# ---------------------------------------------------------------------------
# device-resident decompressed output: u32 word carrier + exact retyping
# ---------------------------------------------------------------------------

class DeviceWords:
    """A decompressed byte stream held on device as uint32 words.

    The fused decode pipelines produce output chunks as u32 words; keeping
    the device-resident result in the 32-bit integer domain is both the
    fast representation (rule 2 above: u32 relayouts run at HBM rate,
    sub-32-bit ones at ~4 GB/s — the round-4 in-dispatch u8 conversion
    DOUBLED the decode wall) and the exact one (rule 3: float-typed and
    sub-32-bit relayouts canonicalize NaNs / flush bf16 denormals).

    ``words`` is a 1-D uint32 jax array covering ``nbytes`` little-endian
    bytes (possibly zero-padded past the end); ``nbytes`` is the logical
    length.  Use :meth:`to_numpy` / :meth:`tobytes` for host marshalling
    (device->host fetch of the words IS the byte stream) and
    :func:`words_to_typed` to retype on device.
    """

    __slots__ = ("words", "nbytes")

    def __init__(self, words, nbytes: int):
        self.words = words
        self.nbytes = int(nbytes)

    def __len__(self) -> int:
        return self.nbytes

    def to_numpy(self):
        import numpy as np  # noqa: PLC0415

        flat = np.asarray(self.words).reshape(-1)
        return flat.astype("<u4", copy=False).view(np.uint8)[: self.nbytes]

    def tobytes(self) -> bytes:
        return self.to_numpy().tobytes()

    def block_until_ready(self):
        self.words.block_until_ready()
        return self


# hazard predicates per dtype code (core/dtypes.py codes): a "hazard" is a
# bit pattern that TPU float-typed relayouts do not preserve (NaN payloads
# for every float dtype; denormals for bf16 and fp8).  fp32 relayouts and
# fp16 denormals are exact (measured; pinned by tests).
_HAZ_16 = {
    6: lambda h: (  # bfloat16: denormal or any NaN
        ((h >> 7) & jnp.uint16(0xFF) == 0) & ((h & jnp.uint16(0x7F)) != 0)
    ) | (
        ((h >> 7) & jnp.uint16(0xFF) == 0xFF) & ((h & jnp.uint16(0x7F)) != 0)
    ),
    4: lambda h: (  # float16: NaN payloads only (denormals are exact)
        ((h >> 10) & jnp.uint16(0x1F) == 0x1F) & ((h & jnp.uint16(0x3FF)) != 0)
    ),
}
_HAZ_16[5] = _HAZ_16[4]
_HAZ_8 = {
    29: lambda b: (  # e4m3fn: NaN (0x7F/0xFF) or denormal
        (b & jnp.uint8(0x7F)) == 0x7F
    ) | (
        ((b >> 3) & jnp.uint8(0xF) == 0) & ((b & jnp.uint8(0x7)) != 0)
    ),
    30: lambda b: (  # e5m2: NaN or denormal
        ((b >> 2) & jnp.uint8(0x1F) == 0x1F) & ((b & jnp.uint8(0x3)) != 0)
    ) | (
        ((b >> 2) & jnp.uint8(0x1F) == 0) & ((b & jnp.uint8(0x3)) != 0)
    ),
}


def _jax_target(code: int):
    m = {
        1: jnp.float32, 2: jnp.float32, 4: jnp.float16, 5: jnp.float16,
        6: jnp.bfloat16, 29: jnp.float8_e4m3fn, 30: jnp.float8_e5m2,
    }
    return m.get(code)


from functools import lru_cache as _lru_cache  # noqa: E402


@_lru_cache(maxsize=None)
def _typed_call(code: int, shape: tuple, n_words: int, nbytes: int):
    target = _jax_target(code)
    itemsize = {1: 4, 2: 4, 4: 2, 5: 2, 6: 2, 29: 1, 30: 1}[code]
    last = shape[-1] if shape else 1
    row_bytes = last * itemsize
    if row_bytes % 4 or nbytes % row_bytes:
        return None  # odd-geometry leaf: caller marshals via host
    rows = nbytes // row_bytes

    def run(words):
        w2 = words[: nbytes // 4].reshape(rows, row_bytes // 4)
        if itemsize == 4:
            arr = jax.lax.bitcast_convert_type(w2, target)
        elif itemsize == 2:
            arr = jax.lax.bitcast_convert_type(
                bitcast_merge(w2, jnp.uint16), target
            )
        else:
            arr = jax.lax.bitcast_convert_type(
                bitcast_merge(w2, jnp.uint8), target
            )
        # hazard count on the FULL word array: tail padding is zeros
        # (never hazardous), so scanning words is equivalent to scanning
        # the logical bytes
        if code in (1, 2):
            count = jnp.zeros((), jnp.int32)  # fp32 relayouts are exact
        elif itemsize == 2:
            h = bitcast_merge(words.reshape(-1, 128), jnp.uint16)
            count = jnp.sum(_HAZ_16[code](h).astype(jnp.int32))
        else:
            b = bitcast_merge(words.reshape(-1, 128), jnp.uint8)
            count = jnp.sum(_HAZ_8[code](b).astype(jnp.int32))
        return arr.reshape(shape), count

    return jax.jit(run)


def words_to_typed(dw: "DeviceWords", code: int, shape):
    """Retype a :class:`DeviceWords` stream to a float jax array on device.

    Returns ``(arr, hazard_count)`` — both device values, produced by ONE
    fused dispatch — or ``None`` when the geometry has no fast device path
    (odd last dimension, unknown dtype code, word count not a multiple of
    128).  ``hazard_count`` MUST be checked before trusting ``arr``: a
    nonzero count means the stream contains bit patterns (NaN payloads,
    bf16/fp8 denormals) that TPU float relayouts canonicalize, and the
    caller must marshal via host instead (fetching the words and uploading
    the final dtype view is exact — rule 3 above).
    """
    shape = tuple(int(s) for s in shape) or (1,)
    if _jax_target(code) is None:
        return None
    n_words = int(dw.words.shape[0])
    if n_words % 128 or 4 * n_words < dw.nbytes:
        return None
    call = _typed_call(code, shape, n_words, dw.nbytes)
    if call is None:
        return None
    return call(dw.words)
