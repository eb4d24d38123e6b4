"""Chunk-data-parallel compression over a device mesh.

Run on real chips, or virtually:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python example_multichip.py
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
from zipnn_tpu import ZipNN, parallel

rng = np.random.default_rng(0)
vals = (rng.standard_normal(1_000_000) * 0.05).astype(np.float32)
data = ((vals.view(np.uint32) >> 16).astype(np.uint16)).tobytes()

mesh = parallel.make_mesh()
print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))
with parallel.use_mesh(mesh):
    z = ZipNN(engine="tpu", compression_chunk=16384)
    c = z.compress(data)
    back = ZipNN(engine="tpu", compression_chunk=16384).decompress(c)
assert back == data
print(f"sharded roundtrip OK, ratio {len(c)/len(data):.4f}")
