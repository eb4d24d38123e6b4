"""Load a .znn-compressed Hugging Face checkpoint transparently
(reference simple_example_granite.py / examples/*).

Compress a downloaded model first:
  python -m zipnn_tpu.cli.compress_path safetensors --model <model-id> --hf_cache
then load it with the plugin active:
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

from zipnn_tpu import zipnn_hf

zipnn_hf()

if len(sys.argv) > 1:
    from transformers import AutoModel

    model = AutoModel.from_pretrained(sys.argv[1])
    print("loaded", sys.argv[1], "->", sum(p.numel() for p in model.parameters()), "params")
else:
    print("usage: python example_hf_model.py <model-id-or-path>")
