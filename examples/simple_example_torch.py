"""torch.Tensor roundtrip for every supported float dtype
(reference simple_example_torch.py)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import torch
from zipnn_tpu import ZipNN

for dtype in (torch.bfloat16, torch.float16, torch.float32):
    t = (torch.randn(1000, 1024) * 0.05).to(dtype)
    znn = ZipNN(input_format="torch")
    c = znn.compress(t)
    back = ZipNN(input_format="torch").decompress(c)
    ok = torch.equal(back.view(torch.int16 if dtype != torch.float32 else torch.int32),
                     t.view(torch.int16 if dtype != torch.float32 else torch.int32))
    print(f"{dtype}: ratio {len(c) / (t.numel() * t.element_size()):.4f} exact={ok}")
    assert ok
