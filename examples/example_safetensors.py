"""Per-tensor safetensors compression + transparent SafeOpen loading."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import torch
from safetensors.torch import save_file
from zipnn_tpu.plugins.safetensors import (
    SafeOpen, compress_tensor, set_compressed_tensors_metadata,
)

tensors = {"w1": torch.randn(256, 257).to(torch.bfloat16),
           "w2": torch.randn(64, 65)}
out, infos = {}, {}
for name, t in tensors.items():
    res = compress_tensor(t)
    if res is None:
        out[name] = t
    else:
        out[name], infos[name] = res
md = {"format": "pt"}
set_compressed_tensors_metadata(infos, md)
save_file(out, "/tmp/model.znn.safetensors", metadata=md)

with SafeOpen("/tmp/model.znn.safetensors", framework="pt") as f:
    for name, t in tensors.items():
        got = f.get_tensor(name)
        assert torch.equal(got.view(torch.int16), t.view(torch.int16))
print("safetensors per-tensor roundtrip OK,", len(infos), "tensors compressed")
