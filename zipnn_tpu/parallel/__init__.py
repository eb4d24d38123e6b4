"""Multi-chip / multi-host parallelism for the ``.znn`` codec.

The format is embarrassingly chunk-parallel by construction (reference
design note csrc/zipnn_core.c:710-728): every (plane, chunk) cell is an
independent stream with a known output offset.  The reference exploits this
with pthreads on one host; here the same axis is sharded over a
``jax.sharding.Mesh`` — chunk data parallelism over ICI within a slice and
DCN across hosts — with XLA inserting the collectives.

Usage::

    mesh = parallel.make_mesh()            # all visible devices
    with parallel.use_mesh(mesh):
        ZipNN(engine="tpu").compress(...)  # device stages run shard_mapped
"""
from . import multihost  # noqa: F401
from .sharded import (  # noqa: F401
    get_default_mesh,
    make_mesh,
    sharded_combine,
    sharded_decode_streams,
    sharded_encode_streams,
    sharded_histogram,
    sharded_split,
    use_mesh,
)
