"""zipnn_tpu — TPU-native lossless compression for AI model weights.

A from-scratch JAX/XLA/Pallas (+ native C++ host core) reimplementation of
the ZipNN lossless weight-compression format: byte-plane grouping with
sign-bit rotation, per-plane Huffman/FSE entropy coding in independent
chunks, and the ``.znn`` container — bit-compatible with the reference
library's format on both compress and decompress.

Public surface mirrors the reference package (zipnn/__init__.py:1):
``ZipNN``, ``zipnn_hf``, ``zipnn_safetensors`` — plus TPU-native extras
under ``zipnn_tpu.parallel`` and ``zipnn_tpu.ops``.
"""

from .zipnn import ZipNN  # noqa: F401

__version__ = "0.1.0"


def zipnn_hf(replace_local_file: bool = False):
    """Patch transformers to transparently load ``.znn`` checkpoints."""
    from .plugins.hf import zipnn_hf as _impl  # noqa: PLC0415

    return _impl(replace_local_file=replace_local_file)


def zipnn_safetensors():
    """Patch safetensors.safe_open to transparently decompress tensors."""
    from .plugins.safetensors import zipnn_safetensors as _impl  # noqa: PLC0415

    return _impl()


__all__ = ["ZipNN", "zipnn_hf", "zipnn_safetensors", "__version__"]
