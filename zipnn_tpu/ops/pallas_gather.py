"""Pallas row gather: many variable-offset row reads at DMA speed.

XLA lowers a batched ``dynamic_slice`` (and any gather with row-sized
slices) to a serial one-row-at-a-time loop on TPU — ~3 us per row no matter
the row size, which makes slicing tens of thousands of compressed streams
out of a payload the bottleneck of the fused decode pipeline.

This kernel does it the hardware-native way: the source is viewed as
``[X, 128]`` uint32 (Mosaic allows DMA slices at row granularity there =
512-byte offsets), row starts arrive via scalar prefetch, and each grid
step issues a burst of async HBM->VMEM copies over a small semaphore ring.
Issue cost is ~0.2 us/DMA and the copies overlap, so the gather runs near
HBM bandwidth.  Sub-row alignment is the *caller's* job: consumers either
barrel-shift in XLA (stored planes) or handle per-lane offsets natively
(the lockstep decode kernel's per-lane ``wtop``).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

LANE = 128  # words per source row (512 bytes)
ROWS_PER_BLOCK = 256
SEM_RING = 16


def _rows_per_block(row_tiles: int, max_rows: int, budget: int = 40 * 1024 * 1024) -> int:
    """Rows per grid block, shrunk for wide rows so the double-buffered
    out block stays within ``budget`` bytes (wide stored planes: a 256 KB
    bf16 chunk's plane is 258 tiles per row)."""
    per_row = row_tiles * LANE * 4
    r = max(8, min(max_rows, budget // (2 * per_row)))
    return (r // 8) * 8


# Set True to run the kernels via the Pallas interpreter (CPU tests).
INTERPRET = False


def _gather_call(n_blocks: int, row_tiles: int, rows_per_block: int):
    return _gather_call_cached(n_blocks, row_tiles, rows_per_block, INTERPRET)


@lru_cache(maxsize=None)
def _gather_call_cached(
    n_blocks: int, row_tiles: int, rows_per_block: int, interpret: bool
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = rows_per_block

    def kernel(starts_ref, src_ref, out_ref, sems):
        b = pl.program_id(0)

        def issue(r):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(starts_ref[b * R + r], row_tiles)],
                out_ref.at[0, r],
                sems.at[r % SEM_RING],
            )

        for r in range(R):
            if r >= SEM_RING:
                issue(r - SEM_RING).wait()
            issue(r).start()
        for r in range(max(R - SEM_RING, 0), R):
            issue(r).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, R, row_tiles, LANE),
            lambda b, starts: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((SEM_RING,))],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, R, row_tiles, LANE), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # double-buffered out blocks exceed the 16MB default for wide
            # rows (fp32/fp8 stored planes); callers gate at <= 96KB rows
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    return jax.jit(call)


def gather_rows(src_tiles, tile_starts, row_tiles: int):
    """rows[i] = src_tiles[tile_starts[i] : tile_starts[i] + row_tiles].

    ``src_tiles`` is a device uint32 array [X, 128] (one tile row = 128
    words = 512 bytes); returns [n, row_tiles * 128] uint32.  Starts must be
    in-bounds: ``0 <= start`` and ``start + row_tiles <= X``.
    """
    import jax.numpy as jnp

    n = tile_starts.shape[0]
    R = _rows_per_block(row_tiles, ROWS_PER_BLOCK)
    n_pad = -(-max(n, 1) // R) * R
    st = jnp.asarray(tile_starts, jnp.int32)
    if n_pad != n:
        st = jnp.concatenate([st, jnp.zeros(n_pad - n, jnp.int32)])
    out = _gather_call(n_pad // R, row_tiles, R)(st, src_tiles)
    return out.reshape(n_pad, row_tiles * LANE)[:n]


ALIGN_ROWS_PER_BLOCK = 128


def _align_call(n_blocks: int, row_tiles: int, bitshift: bool, rows_per_block: int):
    return _align_call_cached(n_blocks, row_tiles, bitshift, rows_per_block, INTERPRET)


@lru_cache(maxsize=None)
def _align_call_cached(
    n_blocks: int, row_tiles: int, bitshift: bool, rows_per_block: int, interpret: bool
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = rows_per_block
    RT = row_tiles - 1  # one tile of each input row is alignment slack

    def kernel(shifts_ref, in_ref, out_ref):
        b = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (RT, LANE), 1)
        for r in range(R):
            enc = shifts_ref[b * R + r]
            dw = enc & 127
            x = in_ref[0, r]  # [RT + 1, 128]
            a = pltpu.roll(x, (LANE - dw) % LANE, axis=1)
            w = jnp.where(lane < LANE - dw, a[:RT], a[1:])
            if bitshift:
                # fuse word i+1 + the sub-word byte shift into this pass:
                # an XLA [1:] lane slice would relayout the whole array
                sh = (enc >> 7).astype(jnp.uint32)  # 0, 8, 16 or 24
                a2 = pltpu.roll(x, (LANE - dw - 1) % LANE, axis=1)
                wn = jnp.where(lane < LANE - 1 - dw, a2[:RT], a2[1:])
                shifted = (w >> sh) | (wn << ((jnp.uint32(32) - sh) & 31))
                w = jnp.where(sh == 0, w, shifted)
            out_ref[0, r] = w

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (1, R, row_tiles, LANE),
                lambda b, shifts: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, R, RT, LANE),
            lambda b, shifts: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, R, RT, LANE), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )
    return jax.jit(call)


def align_rows(rows, word_shifts, bit_shifts=None):
    """rows[i, j] -> rows[i, word_shifts[i] + j]: per-row word alignment.

    ``rows`` is [n, row_tiles * 128] uint32 (e.g. a :func:`gather_rows`
    result whose true row data starts ``word_shifts[i]`` words in,
    ``0 <= shift < 128``); returns [n, (row_tiles - 1) * 128].  One in-VMEM
    lane roll + sublane-carry select per row — replaces an XLA 7-pass
    barrel shift (a lane-shuffle pass over the whole array per bit) with a
    single pass.

    ``bit_shifts`` (per-row 0/8/16/24) additionally applies the sub-word
    byte shift in the same pass: out[j] = aligned[j] >> sh | aligned[j+1]
    << (32-sh).
    """
    import jax.numpy as jnp

    n, w = rows.shape
    row_tiles = w // LANE
    R = _rows_per_block(row_tiles, ALIGN_ROWS_PER_BLOCK, 20 * 1024 * 1024)
    n_pad = -(-max(n, 1) // R) * R
    x = rows.reshape(n, row_tiles, LANE)
    sh = jnp.asarray(word_shifts, jnp.int32)
    if bit_shifts is not None:
        sh = sh | (jnp.asarray(bit_shifts, jnp.int32) << 7)
    if n_pad != n:
        x = jnp.concatenate(
            [x, jnp.zeros((n_pad - n, row_tiles, LANE), jnp.uint32)]
        )
        sh = jnp.concatenate([sh, jnp.zeros(n_pad - n, jnp.int32)])
    out = _align_call(n_pad // R, row_tiles, bit_shifts is not None, R)(
        sh, x.reshape(n_pad // R, R, row_tiles, LANE)
    )
    return out.reshape(n_pad, (row_tiles - 1) * LANE)[:n]


CONST_SCAN_ROWS = 32


@lru_cache(maxsize=None)
def _const_scan_call_cached(n_blocks: int, W: int, R: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    U = jnp.uint32

    def kernel(in_ref, out_ref):
        w = in_ref[0]  # [R, W] uint32
        b0 = w[:, 0:1] & U(0xFF)
        ok = jnp.all(w == b0 * U(0x01010101), axis=1, keepdims=True)
        flag = (b0.astype(jnp.int32) | (ok.astype(jnp.int32) << 8))
        out_ref[0] = jnp.broadcast_to(flag, (R, LANE))

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, R, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, R, LANE), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks, R, LANE), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )
    return call


def const_scan_rows(rows):
    """Per-row constant-cell scan: [N, W] uint32 -> [N] int32 flags.

    Flag layout: bits 0-7 = the row's first byte, bit 8 = the whole row is
    that byte replicated (an RLE cell).  One streaming VMEM pass at HBM
    rate — the XLA ``jnp.all(row == splat)`` formulation measured ~12 GB/s
    on v5e (it re-reads the materialized planes without fusing), ~8x
    slower than this kernel.  Used by the sampled fused-encode pipeline
    (jax_codec._fused_split_hist_sampled_call) where the full-container
    MXU histogram that used to provide RLE detection no longer runs.
    """
    import jax
    import jax.numpy as jnp

    N, W = rows.shape
    U = jnp.uint32
    R = CONST_SCAN_ROWS
    outs = []
    nb_main = N // R
    # the kernel needs a real TPU (or interpret mode); the XLA fallback
    # below is exact, just slower — CPU tests drive the fused pipeline
    # through it (jax_codec.FORCE_DEVICE_PATH)
    on_tpu = INTERPRET or jax.devices()[0].platform == "tpu"
    if on_tpu and W % LANE == 0 and nb_main:
        main = _const_scan_call_cached(nb_main, W, R, INTERPRET)(
            rows[: nb_main * R].reshape(nb_main, R, W)
        )
        outs.append(main[:, :, 0].reshape(-1))
        tail = rows[nb_main * R :]
    else:
        tail = rows
    if tail.shape[0]:
        b0 = tail[:, 0:1] & U(0xFF)
        ok = jnp.all(tail == b0 * U(0x01010101), axis=1, keepdims=True)
        outs.append(
            (b0.astype(jnp.int32) | (ok.astype(jnp.int32) << 8))[:, 0]
        )
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


def to_tiles(region_u8):
    """Pad a flat uint8 payload to [X, 128] uint32 tiles (device)."""
    import jax.numpy as jnp

    from . import jax_transforms

    n = region_u8.shape[0]
    pad = (-n) % 512 + 512  # alignment + one guard tile
    padded = jnp.concatenate([region_u8, jnp.zeros(pad, jnp.uint8)])
    # strided lane construction: a bitcast via u8[N, 4] would be lane-padded
    # 32x in HBM (TPU minor-dim tiling)
    return jax_transforms.u8_flat_to_u32(padded).reshape(-1, LANE)
