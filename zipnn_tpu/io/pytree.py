"""Compressed jax-pytree checkpointing on the safetensors container.

The TPU-native serving flow the reference leaves to torch scripts
(reference scripts/zipnn_compress_safetensors.py + zipnn.py:1584-1643):

* :func:`save_pytree` flattens a pytree with key paths and writes ONE
  ``.znn.safetensors`` file — float leaves compressed per-tensor under
  the reference ``znn_compressed_vectors`` schema (util_safetensors.py:
  9-58), so the file also loads through the reference ecosystem /
  ``SafeOpen`` / ``zipnn_safetensors()``;
* :func:`load_pytree` decompresses each leaf and ``jax.device_put``\\ s
  it straight to a caller-chosen sharding — a cold compressed checkpoint
  lands sharded on the mesh in one call.

Key paths are joined with ``/`` (dict keys, attribute names, sequence
indices).  Without a ``like`` tree, :func:`load_pytree` returns nested
dicts keyed by path components; with one, the original treedef is
rebuilt.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import numpy as np

__all__ = ["save_pytree", "load_pytree", "leaf_paths"]


def _key_str(k) -> str:
    from jax.tree_util import DictKey, FlattenedIndexKey, GetAttrKey, SequenceKey

    if isinstance(k, DictKey):
        return str(k.key)
    if isinstance(k, GetAttrKey):
        return str(k.name)
    if isinstance(k, (SequenceKey, FlattenedIndexKey)):
        return str(k.idx if isinstance(k, SequenceKey) else k.key)
    return str(k)


def leaf_paths(tree) -> Dict[str, Any]:
    """Flatten a pytree to {'a/b/0': leaf} with deterministic paths.

    ``/`` is the path separator, so a dict key that itself contains ``/``
    would be ambiguous on the no-``like`` load path (it re-nests by
    splitting on ``/``) — such keys are rejected here.  Note sequence
    leaves come back as dicts keyed by stringified indices unless
    ``load_pytree(..., like=...)`` supplies the original treedef.
    """
    from jax.tree_util import tree_flatten_with_path

    flat, _ = tree_flatten_with_path(tree)
    out: Dict[str, Any] = {}
    for kp, leaf in flat:
        comps = [_key_str(k) for k in kp]
        for c in comps:
            if "/" in c:
                raise ValueError(
                    f"pytree key {c!r} contains the path separator '/'; "
                    "rename the key (paths could not round-trip without "
                    "the original treedef)"
                )
        name = "/".join(comps) or "_root"
        if name in out:
            raise ValueError(f"duplicate leaf path {name!r}")
        out[name] = leaf
    return out


def _leaf_to_torch(x):
    """jax/numpy leaf -> torch tensor, bit-preserving (bf16/fp8 via
    uint views; io/streaming.np_to_torch holds the dtype table)."""
    from .streaming import np_to_torch

    arr = np.asarray(x)
    # ascontiguousarray promotes 0-d to 1-d; restore the original rank so
    # scalar leaves round-trip with their shape
    return np_to_torch(np.ascontiguousarray(arr)).reshape(arr.shape)


def save_pytree(
    path: str,
    tree,
    *,
    engine: str = "auto",
    huffman_table: str = "per_chunk",
) -> Dict[str, bool]:
    """Write ``tree`` as one compressed ``.znn.safetensors`` file.

    Float leaves are compressed per-tensor (keep-raw-if-bigger rule,
    reference scripts/zipnn_compress_safetensors.py:103-109); integer /
    bool leaves store raw.  Returns {path: was_compressed}.
    """
    import torch  # noqa: PLC0415
    from safetensors.torch import save_file  # noqa: PLC0415

    from ..plugins.safetensors import (  # noqa: PLC0415
        COMPRESSION_METHOD, build_compressed_tensor_info,
        set_compressed_tensors_metadata,
    )
    from ..zipnn import ZipNN  # noqa: PLC0415

    leaves = {name: _leaf_to_torch(x) for name, x in leaf_paths(tree).items()}
    out: Dict[str, "torch.Tensor"] = {}
    infos: Dict[str, Dict[str, str]] = {}
    compressed: Dict[str, bool] = {}
    for name, t in leaves.items():
        blob = None
        if t.is_floating_point():
            znn = ZipNN(
                input_format="torch", method=COMPRESSION_METHOD,
                engine=engine, huffman_table=huffman_table,
            )
            b = znn.compress(t)
            if b is not None and len(b) < t.numel() * t.element_size():
                blob = bytes(b)
        if blob is None:
            out[name] = t
            compressed[name] = False
        else:
            infos[name] = build_compressed_tensor_info(t)
            out[name] = torch.from_numpy(
                np.frombuffer(blob, dtype=np.uint8).copy()
            )
            compressed[name] = True
    metadata: Dict[str, str] = {"format": "pt"}
    set_compressed_tensors_metadata(infos, metadata)
    save_file(out, path, metadata=metadata)
    return compressed


def load_pytree(
    path: str,
    *,
    like=None,
    shardings: Optional[Any] = None,
):
    """Load a :func:`save_pytree` file back into a jax pytree.

    ``shardings``: None (host/default-device arrays), a single
    ``jax.sharding.Sharding`` applied to every leaf, a {path: Sharding}
    dict (missing paths stay unsharded), or a callable ``path ->
    Sharding | None``.  Decompressed leaves are placed with
    ``jax.device_put`` — with a ``NamedSharding`` over a multi-chip mesh
    this is the cold-checkpoint serving load.

    ``like``: a pytree with the same structure; when given, the result
    reuses its treedef.  Without it the result is nested dicts keyed by
    path parts — sequence leaves come back as dicts keyed by stringified
    indices, so round-tripping the exact structure requires ``like``.
    """
    import jax  # noqa: PLC0415

    from ..plugins.safetensors import SafeOpen  # noqa: PLC0415

    def _shard_for(name: str):
        if shardings is None:
            return None
        if callable(shardings):
            return shardings(name)
        if isinstance(shardings, dict):
            return shardings.get(name)
        return shardings  # a single Sharding for every leaf

    values: Dict[str, Any] = {}
    with SafeOpen(path, "flax") as f:
        # bulk path: compressed leaves decode through the pipelined
        # ShardDecoder (leaf N+1's host plan under leaf N's device decode)
        for name, x in f.get_tensors().items():
            s = _shard_for(name)
            values[name] = jax.device_put(x, s) if s is not None else x

    if like is not None:
        from jax.tree_util import tree_flatten_with_path, tree_unflatten

        flat, treedef = tree_flatten_with_path(like)
        ordered = []
        for kp, _ in flat:
            name = "/".join(_key_str(k) for k in kp) or "_root"
            if name not in values:
                raise KeyError(f"checkpoint is missing leaf {name!r}")
            ordered.append(values.pop(name))
        if values:
            raise ValueError(
                f"checkpoint has extra leaves {sorted(values)[:5]}"
            )
        return tree_unflatten(treedef, ordered)

    root: Dict[str, Any] = {}
    for name, v in values.items():
        parts = name.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return root.get("_root", root) if list(root) == ["_root"] else root
