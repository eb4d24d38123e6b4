"""Ecosystem integration plugins (reference L4, zipnn/zipnn.py:1221-1643).

* :mod:`.safetensors` — transparent per-tensor decompression inside
  ``safetensors.safe_open`` (``znn_compressed_vectors`` metadata schema).
* :mod:`.hf` — transformers monkey-patch so ``from_pretrained`` finds and
  streams ``.znn`` checkpoints.
* :mod:`.patch` — propagate monkey-patches into spawned worker processes
  (how vLLM/accelerate workers see the patched loader).
"""
