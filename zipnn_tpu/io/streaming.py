"""Streaming safetensors reader with transparent ``.znn`` decompression.

safetensors layout: ``[8B little-endian header length][json header][data]``
where the header maps tensor name -> {dtype, shape, data_offsets}.  This
reader seeks straight to a tensor's byte range instead of mapping the whole
file, so a multi-host loader can fan tensor reads out across hosts — each
host touches only its shard's bytes (the multi-host design SURVEY.md §2.3
calls for; the reference has no equivalent).

Compressed tensors (per-tensor codec, ``znn_compressed_vectors`` metadata —
zipnn/util_safetensors.py:9 schema) are decompressed on read; with
``device=True`` the result is a JAX device array.
"""
from __future__ import annotations

import json
import os
from struct import unpack
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_ST_DTYPES = {
    "F64": ("float64", 8), "F32": ("float32", 4), "F16": ("float16", 2),
    "BF16": ("bfloat16", 2), "F8_E4M3": ("float8_e4m3fn", 1),
    "F8_E5M2": ("float8_e5m2", 1), "I64": ("int64", 8), "I32": ("int32", 4),
    "I16": ("int16", 2), "I8": ("int8", 1), "U8": ("uint8", 1),
    "U16": ("uint16", 2), "U32": ("uint32", 4), "U64": ("uint64", 8),
    "BOOL": ("bool", 1),
}


def partition_names(
    entries: Sequence[Tuple[str, int]], n_hosts: int, host_id: int
) -> List[str]:
    """Size-balanced partition of (name, nbytes) entries across hosts.

    Greedy largest-first binning: deterministic given the same inputs, so
    every host computes the same global assignment without communication.
    """
    if not 0 <= host_id < n_hosts:
        raise ValueError(f"host_id {host_id} out of range for {n_hosts} hosts")
    loads = [0] * n_hosts
    owner: Dict[str, int] = {}
    for name, size in sorted(entries, key=lambda e: (-e[1], e[0])):
        h = loads.index(min(loads))
        owner[name] = h
        loads[h] += size
    return [n for n, _ in entries if owner[n] == host_id]


class SafetensorsStreamReader:
    """Range-reading safetensors loader with transparent znn decompression."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            (hlen,) = unpack("<Q", f.read(8))
            header = json.loads(f.read(hlen))
        self._data_start = 8 + hlen
        self.metadata: Dict[str, str] = header.pop("__metadata__", {}) or {}
        self._tensors = header
        comp = self.metadata.get("znn_compressed_vectors")
        self.compressed: Dict[str, Dict] = json.loads(comp) if comp else {}

    # -- introspection ---------------------------------------------------
    def keys(self) -> List[str]:
        return list(self._tensors.keys())

    def nbytes(self, name: str) -> int:
        lo, hi = self._tensors[name]["data_offsets"]
        return hi - lo

    def entries(self) -> List[Tuple[str, int]]:
        return [(n, self.nbytes(n)) for n in self.keys()]

    def shard_names(self, n_hosts: int, host_id: int) -> List[str]:
        """The tensor names this host should read (deterministic across
        hosts — no communication needed)."""
        return partition_names(self.entries(), n_hosts, host_id)

    # -- range reads -----------------------------------------------------
    def read_bytes(self, name: str) -> bytes:
        info = self._tensors[name]
        lo, hi = info["data_offsets"]
        with open(self.path, "rb") as f:
            f.seek(self._data_start + lo)
            return f.read(hi - lo)

    def _np_raw(self, name: str) -> np.ndarray:
        """Stored bytes viewed as the stored dtype (uint8 for compressed)."""
        info = self._tensors[name]
        np_name, _ = _ST_DTYPES[info["dtype"]]
        raw = np.frombuffer(self.read_bytes(name), dtype=np.uint8)
        if np_name in ("bfloat16", "float8_e4m3fn", "float8_e5m2"):
            import ml_dtypes  # noqa: PLC0415

            dt = getattr(ml_dtypes, np_name)
        else:
            dt = np.dtype(np_name)
        return raw.view(dt).reshape(info["shape"])

    def get_tensor(self, name: str, device: bool = False):
        """Read one tensor (decompressing if needed).

        Returns a numpy array (bf16/fp8 via ml_dtypes), or a JAX device
        array with ``device=True``.
        """
        if name in self.compressed:
            from ..zipnn import ZipNN  # noqa: PLC0415

            znn = ZipNN(input_format="torch", bytearray_dtype="uint8", method="HUFFMAN")
            t = znn.decompress(np.frombuffer(self.read_bytes(name), dtype=np.uint8))
            arr = _torch_to_np(t)
        else:
            arr = self._np_raw(name)
        if device:
            import jax.numpy as jnp  # noqa: PLC0415

            return jnp.asarray(arr)
        return arr

    def load_shard(
        self, n_hosts: int = 1, host_id: int = 0, device: bool = False
    ) -> Dict[str, np.ndarray]:
        """Read this host's partition of the file (byte-range reads only)."""
        return {n: self.get_tensor(n, device=device) for n in self.shard_names(n_hosts, host_id)}

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def np_to_torch(arr: np.ndarray):
    """numpy (incl. ml_dtypes bf16/fp8 views) -> torch tensor (copying:
    range-read buffers are read-only)."""
    import torch  # noqa: PLC0415

    name = arr.dtype.name
    if name == "bfloat16":
        return torch.from_numpy(
            np.ascontiguousarray(arr).view(np.uint16).copy()
        ).view(torch.bfloat16)
    if name in ("float8_e4m3fn", "float8_e5m2"):
        return torch.from_numpy(
            np.ascontiguousarray(arr).view(np.uint8).copy()
        ).view(getattr(torch, name))
    return torch.from_numpy(np.ascontiguousarray(arr).copy())


def _torch_to_np(t) -> np.ndarray:
    import torch  # noqa: PLC0415

    if t.dtype == torch.bfloat16:
        import ml_dtypes  # noqa: PLC0415

        return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
    if t.dtype == torch.float8_e4m3fn:
        import ml_dtypes  # noqa: PLC0415

        return t.view(torch.uint8).numpy().view(ml_dtypes.float8_e4m3fn)
    if t.dtype == torch.float8_e5m2:
        import ml_dtypes  # noqa: PLC0415

        return t.view(torch.uint8).numpy().view(ml_dtypes.float8_e5m2)
    return t.numpy()
