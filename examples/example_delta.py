"""Delta (XOR) compression of a fine-tuned checkpoint vs its base
(reference scripts/zipnn_compress_file_delta.py semantics)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
from zipnn_tpu import ZipNN

rng = np.random.default_rng(0)
base = (rng.standard_normal(1_000_000) * 0.05).astype(np.float32).tobytes()
# a fine-tune barely moves most weights -> XOR is highly compressible
ft = np.frombuffer(base, np.float32).copy()
ft[:1000] += 1e-3
ft = ft.tobytes()

znn = ZipNN(delta_compressed_type="byte")
c_delta = znn.compress(ft, delta_second_data=base)
c_plain = ZipNN().compress(ft)
print(f"plain ratio {len(c_plain)/len(ft):.4f}  delta ratio {len(c_delta)/len(ft):.4f}")
back = ZipNN(delta_compressed_type="byte").decompress(c_delta, delta_second_data=base)
assert back == ft
print("delta roundtrip OK")
