"""JAX device-array roundtrip + the TPU-optimal shared-table profile."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np
from zipnn_tpu import ZipNN

x = (jnp.asarray(np.random.default_rng(0).standard_normal((512, 513)))
     .astype(jnp.bfloat16) * 0.05)
znn = ZipNN(input_format="jax", huffman_table="shared", compression_chunk=16384)
c = znn.compress(x)
back = ZipNN(input_format="jax").decompress(c)
assert back.dtype == x.dtype and back.shape == x.shape
assert np.array_equal(np.asarray(back).view(np.uint16), np.asarray(x).view(np.uint16))
print(f"jax roundtrip OK, ratio {len(c) / x.nbytes:.4f}")
