"""Host-side IO: streaming safetensors reading with per-host byte ranges.

The reference loads whole files with one ``infile.read()``
(scripts/zipnn_compress_file.py:104); a TPU pod wants each host to read
only the byte ranges of the tensors it owns and decompress them straight
onto its devices.  :class:`streaming.SafetensorsStreamReader` provides the
range-read primitive and the host partitioning.
"""
from .pytree import leaf_paths, load_pytree, save_pytree  # noqa: F401
from .serving import ShardDecoder, ShardEncoder  # noqa: F401
from .streaming import SafetensorsStreamReader, partition_names  # noqa: F401
