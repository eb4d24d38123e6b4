"""Lossy INTEGER mode: fixed-point quantization with bounded error."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import torch
from zipnn_tpu import ZipNN

t = torch.randn(512, 512)
factor = 16
znn = ZipNN(input_format="torch", lossy_compressed_type="integer",
            lossy_compressed_factor=factor)
c = znn.compress(t)
back = ZipNN(input_format="torch").decompress(c)
err = torch.max(torch.abs(back - t)).item()
lossless = ZipNN(input_format="torch").compress(t)
print(f"lossless ratio {len(lossless)/t.numel()/4:.4f}  "
      f"lossy ratio {len(c)/t.numel()/4:.4f}  max err {err:.2e} <= {2**-factor:.2e}")
assert err <= 2.0 ** -factor
