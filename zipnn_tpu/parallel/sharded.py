"""shard_map wrappers over the device codec stages.

Each wrapper shards the *independent* axis (chunks for transforms, streams
for entropy coding) across every mesh axis, pads it to the shard count, and
runs the single-device kernel per shard.  No collectives are needed inside
the stages — the format guarantees independence — so scaling is linear by
construction; the only cross-device traffic is the final gather of results,
which XLA emits from the output sharding.

The mesh is ambient (``use_mesh``) so the engine plumbing (ZipNN -> codec ->
jax_codec) stays mesh-agnostic: with no mesh set, stages run single-device.
"""
from __future__ import annotations

import contextlib
import math
from functools import partial
from typing import Optional, Sequence

import numpy as np

_DEFAULT_MESH = None


def make_mesh(devices: Optional[Sequence] = None, axis_names: Optional[Sequence[str]] = None):
    """Build a Mesh over ``devices`` (default: all of them).

    With >= 4 devices the mesh is 2D ``(host, chip)`` — chunk shards land on
    the ``chip`` (ICI) axis first, hosts (DCN) second — otherwise 1D
    ``(chip,)``.
    """
    import jax  # noqa: PLC0415
    from jax.sharding import Mesh  # noqa: PLC0415

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_names is None:
        axis_names = ("host", "chip") if n >= 4 and n % 2 == 0 else ("chip",)
    if len(axis_names) == 2:
        hosts = max(d for d in range(1, int(math.isqrt(n)) + 1) if n % d == 0)
        shape = (hosts, n // hosts)
    else:
        shape = (n,)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def get_default_mesh():
    return _DEFAULT_MESH


@contextlib.contextmanager
def use_mesh(mesh):
    """Route the device codec stages through ``mesh`` within the block."""
    global _DEFAULT_MESH
    prev = _DEFAULT_MESH
    _DEFAULT_MESH = mesh
    try:
        yield mesh
    finally:
        _DEFAULT_MESH = prev


def _nshards(mesh) -> int:
    return int(np.prod([mesh.shape[a] for a in mesh.axis_names]))


def _pad_rows(arr, mult: int, fill=0):
    import jax.numpy as jnp  # noqa: PLC0415

    n = arr.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return arr, n
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, widths, constant_values=fill), n


# ---------------------------------------------------------------------------
# entropy stages: shard the stream axis
# ---------------------------------------------------------------------------

def sharded_decode_streams(
    mesh, words, bits_left0, table_log, tbl_off, dtable_flat, seg_len: int, words_per_row: int
):
    """Chunk-data-parallel lockstep decode: streams sharded over the mesh.

    ``words`` is [S, words_per_row]; the decode table is replicated (it is
    small and read-only — the multi-host analog of the reference broadcasting
    nothing because pthreads share memory).
    """
    import jax.numpy as jnp  # noqa: PLC0415
    from jax import shard_map  # noqa: PLC0415
    from jax.sharding import PartitionSpec as P  # noqa: PLC0415

    from ..ops import jax_entropy  # noqa: PLC0415

    k = _nshards(mesh)
    axes = mesh.axis_names
    words, S = _pad_rows(words, k)
    bits_left0, _ = _pad_rows(bits_left0, k, fill=1)  # pad lanes: 1 bit left
    table_log, _ = _pad_rows(table_log, k, fill=1)
    tbl_off, _ = _pad_rows(tbl_off, k)

    def local(w, b, t, o, dt):
        syms, left = jax_entropy.decode_streams(
            w.reshape(-1), b, t, o, dt, seg_len=seg_len, words_per_row=words_per_row
        )
        return syms, left

    syms, left = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes), P(axes), P(axes), P(axes), P()),
        out_specs=(P(axes), P(axes)),
    )(words, bits_left0, table_log, tbl_off, dtable_flat)
    return syms[:S], left[:S]


def sharded_encode_streams(
    mesh, syms, nb_tbl, val_tbl, cell_tbl_off, seg_len: int, words_per_row: int
):
    import jax.numpy as jnp  # noqa: PLC0415
    from jax import shard_map  # noqa: PLC0415
    from jax.sharding import PartitionSpec as P  # noqa: PLC0415

    from ..ops import jax_entropy  # noqa: PLC0415

    k = _nshards(mesh)
    axes = mesh.axis_names
    syms, S = _pad_rows(syms, k)
    cell_tbl_off, _ = _pad_rows(cell_tbl_off, k)

    def local(s, off, nb, val):
        return jax_entropy.encode_streams(
            s, nb, val, off, seg_len=seg_len, words_per_row=words_per_row
        )

    words, total_bits = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes), P(axes), P(), P()),
        out_specs=(P(axes), P(axes)),
    )(syms, cell_tbl_off, nb_tbl, val_tbl)
    return words[:S], total_bits[:S]


def sharded_histogram(mesh, data):
    """Per-cell histograms with cells sharded over the mesh."""
    from jax import shard_map  # noqa: PLC0415
    from jax.sharding import PartitionSpec as P  # noqa: PLC0415

    from ..ops import jax_entropy  # noqa: PLC0415

    k = _nshards(mesh)
    axes = mesh.axis_names
    data, C = _pad_rows(data, k)
    hist = shard_map(
        jax_entropy.histogram_cells,
        mesh=mesh,
        in_specs=(P(axes),),
        out_specs=P(axes),
    )(data)
    return hist[:C]


# ---------------------------------------------------------------------------
# transform stages: shard the chunk axis
# ---------------------------------------------------------------------------

def sharded_split(mesh, words, num_buf: int, byte_reorder: int, bit_reorder: int):
    from jax import shard_map  # noqa: PLC0415
    from jax.sharding import PartitionSpec as P  # noqa: PLC0415

    from ..ops import jax_transforms  # noqa: PLC0415

    k = _nshards(mesh)
    axes = mesh.axis_names
    words, C = _pad_rows(words, k)
    out = shard_map(
        partial(
            jax_transforms.split_device,
            num_buf=num_buf,
            byte_reorder=byte_reorder,
            bit_reorder=bit_reorder,
        ),
        mesh=mesh,
        in_specs=(P(axes),),
        out_specs=P(axes),
    )(words)
    return out[:C]


def sharded_combine(mesh, planes, num_buf: int, byte_reorder: int, bit_reorder: int):
    from jax import shard_map  # noqa: PLC0415
    from jax.sharding import PartitionSpec as P  # noqa: PLC0415

    from ..ops import jax_transforms  # noqa: PLC0415

    k = _nshards(mesh)
    axes = mesh.axis_names
    planes, C = _pad_rows(planes, k)
    out = shard_map(
        partial(
            jax_transforms.combine_device,
            num_buf=num_buf,
            byte_reorder=byte_reorder,
            bit_reorder=bit_reorder,
        ),
        mesh=mesh,
        in_specs=(P(axes),),
        out_specs=P(axes),
    )(planes)
    return out[:C]
