"""safetensors integration: per-tensor transparent decompression.

Compressed tensors are stored inside an ordinary safetensors file as uint8
tensors; the file-level metadata key ``znn_compressed_vectors`` maps tensor
name -> ``{"dtype": ..., "shape": ...}`` of the original tensor.  This is the
reference's on-disk schema (zipnn/util_safetensors.py:9-58), so files written
by either implementation load with the other.

``SafeOpen`` wraps ``safetensors.safe_open`` and decompresses on
``get_tensor`` (reference zipnn/zipnn.py:1592-1626); ``zipnn_safetensors()``
installs it as the module-level ``safe_open`` for torch, numpy, and flax
frontends, propagated into spawned worker processes so vLLM/sglang engines
pick it up.
"""
from __future__ import annotations

import json
from typing import Dict

from ..zipnn import ZipNN
from .patch import multi_process_patcher

METADATA_KEY = "znn_compressed_vectors"
COMPRESSION_METHOD = "HUFFMAN"
COMPRESSED_DTYPE_NAME = "uint8"


# ---------------------------------------------------------------------------
# metadata schema
# ---------------------------------------------------------------------------

def build_compressed_tensor_info(uncompressed_tensor) -> Dict[str, str]:
    """Per-tensor metadata entry: original dtype + shape as strings."""
    dtype = str(uncompressed_tensor.dtype)
    if dtype.startswith("torch."):
        dtype = dtype[len("torch."):]
    return {"dtype": dtype, "shape": str(list(uncompressed_tensor.shape))}


def set_compressed_tensors_metadata(
    compressed_tensor_infos: Dict[str, Dict[str, str]], metadata: Dict[str, str]
) -> None:
    if metadata is not None:
        metadata[METADATA_KEY] = json.dumps(compressed_tensor_infos)


def get_compressed_tensors_metadata(metadata) -> Dict[str, Dict[str, str]]:
    if not metadata:
        return {}
    raw = metadata.get(METADATA_KEY)
    return json.loads(raw) if raw else {}


# ---------------------------------------------------------------------------
# tensor codecs
# ---------------------------------------------------------------------------

def compress_tensor(tensor):
    """Compress one torch tensor -> (uint8 torch tensor, info) or None.

    Applies the keep-raw-if-bigger rule of the reference CLI
    (scripts/zipnn_compress_safetensors.py:103-109): returns None when
    compression does not shrink the tensor.
    """
    import numpy as np  # noqa: PLC0415
    import torch  # noqa: PLC0415

    znn = ZipNN(input_format="torch", method=COMPRESSION_METHOD)
    blob = znn.compress(tensor)
    if blob is None or len(blob) >= tensor.numel() * tensor.element_size():
        return None
    info = build_compressed_tensor_info(tensor)
    arr = np.frombuffer(blob, dtype=np.uint8).copy()
    return torch.from_numpy(arr), info


def decompress_tensor(tensor):
    """Decompress a stored uint8 tensor back to the original torch tensor
    (reference zipnn.py:1584-1589)."""
    znn = ZipNN(
        input_format="torch",
        bytearray_dtype=COMPRESSED_DTYPE_NAME,
        method=COMPRESSION_METHOD,
    )
    return znn.decompress(tensor.contiguous().numpy())


def _to_framework(t, framework: str, device="cpu"):
    """Convert a decompressed torch tensor to the frontend the file was
    opened with.  bf16/fp8 need a bit-level view since numpy lacks them."""
    fw = (framework or "pt").lower()
    if fw in ("pt", "torch"):
        return t if device in (None, "cpu") else t.to(device)
    import torch  # noqa: PLC0415

    if fw in ("np", "numpy"):
        return t.numpy()
    if fw in ("flax", "jax"):
        import jax.numpy as jnp  # noqa: PLC0415
        import ml_dtypes  # noqa: PLC0415

        if t.dtype == torch.bfloat16:
            return jnp.asarray(t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16))
        if t.dtype == torch.float8_e4m3fn:
            return jnp.asarray(t.view(torch.uint8).numpy().view(ml_dtypes.float8_e4m3fn))
        if t.dtype == torch.float8_e5m2:
            return jnp.asarray(t.view(torch.uint8).numpy().view(ml_dtypes.float8_e5m2))
        return jnp.asarray(t.numpy())
    raise ValueError(f"Unsupported safetensors framework {framework!r}")


# ---------------------------------------------------------------------------
# safe_open wrapper
# ---------------------------------------------------------------------------

class SafeOpen:
    """Drop-in ``safetensors.safe_open`` with transparent decompression."""

    def __init__(self, filename, framework, device="cpu"):
        import safetensors  # noqa: PLC0415

        self._framework = framework
        self._device = device
        self._f = safetensors.safe_open(filename, framework, device)
        self.compressed_tensors_metadata = get_compressed_tensors_metadata(
            self._f.metadata()
        )

    def get_tensor(self, name):
        if name not in self.compressed_tensors_metadata:
            return self._f.get_tensor(name)
        stored = self._f.get_tensor(name)
        fw = (self._framework or "pt").lower()
        if fw not in ("pt", "torch"):
            # stored uint8 payload may have come back as np/jax; route
            # through torch for the codec, then convert to the frontend
            import numpy as np  # noqa: PLC0415
            import torch  # noqa: PLC0415

            stored = torch.from_numpy(np.asarray(stored).astype(np.uint8))
        return _to_framework(decompress_tensor(stored), self._framework, self._device)

    def _stored_u8(self, name):
        """Raw stored uint8 payload of a compressed tensor as a numpy view."""
        import numpy as np  # noqa: PLC0415

        stored = self._f.get_tensor(name)
        fw = (self._framework or "pt").lower()
        if fw in ("pt", "torch"):
            return stored.numpy()
        return np.asarray(stored).astype(np.uint8, copy=False)

    def _from_flat(self, name, flat):
        """Reapply dtype/shape from the container metadata to a flat
        decompressed uint8 numpy buffer, then convert to the frontend."""
        import numpy as np  # noqa: PLC0415
        import torch  # noqa: PLC0415

        info = self.compressed_tensors_metadata[name]
        t = torch.from_numpy(np.ascontiguousarray(flat))
        t = t.view(getattr(torch, info["dtype"]))
        t = t.reshape(json.loads(info["shape"]))
        return _to_framework(t, self._framework, self._device)

    def get_tensors(self, names=None):
        """Bulk load: ``{name: tensor}`` for ``names`` (default: all keys).

        Compressed tensors decode through the cross-container pipelined
        ``io.serving.ShardDecoder`` — tensor N+1's host plan overlaps
        tensor N's device decode, and bucketed kernel geometry lets
        similar-sized tensors share one compiled kernel.  This is the bulk
        counterpart of the reference's per-call loader
        (zipnn/zipnn.py:1584-1626); results are bit-identical to
        ``get_tensor`` per name.
        """
        from ..io.serving import ShardDecoder  # noqa: PLC0415

        names = list(self._f.keys()) if names is None else list(names)
        comp = [n for n in names if n in self.compressed_tensors_metadata]
        out = {}
        dec = ShardDecoder(as_numpy=True)
        flats = dec.decompress_iter(self._stored_u8(n) for n in comp)
        decoded = {n: self._from_flat(n, f) for n, f in zip(comp, flats)}
        for n in names:
            out[n] = decoded[n] if n in decoded else self._f.get_tensor(n)
        return out

    def get_slice(self, name):
        if name not in self.compressed_tensors_metadata:
            return self._f.get_slice(name)
        raise NotImplementedError(
            "get_slice on a znn-compressed tensor is not supported; use get_tensor"
        )

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        return self._f.__exit__(exc_type, exc_value, traceback)

    def __getattr__(self, name):
        return getattr(self._f, name)


def _patch_safe_open() -> None:
    import safetensors  # noqa: PLC0415

    for modname in ("torch", "numpy", "flax"):
        try:
            mod = getattr(
                __import__(f"safetensors.{modname}", fromlist=[modname]), "safe_open", None
            )
        except ImportError:
            continue
        if mod is not None:
            getattr(safetensors, modname).safe_open = SafeOpen


def zipnn_safetensors() -> None:
    """Install transparent ``.safetensors`` tensor decompression, propagated
    to spawned processes (reference zipnn.py:1638-1643)."""
    multi_process_patcher(_patch_safe_open)
