"""Byte-buffer roundtrip (reference simple_example_byte.py)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
from zipnn_tpu import ZipNN

rng = np.random.default_rng(0)
vals = (rng.standard_normal(2_000_000) * 0.05).astype(np.float32)
data = ((vals.view(np.uint32) >> 16).astype(np.uint16)).tobytes()  # bf16 bits

znn = ZipNN(input_format="byte", bytearray_dtype="bfloat16")
compressed = znn.compress(data)
print(f"ratio: {len(compressed) / len(data):.4f}")
assert ZipNN(input_format="byte").decompress(compressed) == data
print("byte roundtrip OK", znn.last_stats.as_dict())
