"""Serve a znn-compressed model with vLLM (reference
examples/gpt2-zipnn_vllm.py parity).

``zipnn_safetensors()`` patches ``safetensors.torch.safe_open`` — and,
through the multiprocess patch propagation (zipnn_tpu/plugins/patch.py),
every worker process vLLM spawns — so compressed tensors inside
``*.znn.safetensors`` checkpoints decompress transparently at load time.

Prepare a compressed model directory first, e.g.::

    znn-compress-path --path /models/gpt2 safetensors

then point vLLM at it.  Run on a machine with vllm installed (it is not
part of this build environment, hence the guarded import).
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

from zipnn_tpu import zipnn_safetensors

zipnn_safetensors()

try:
    from vllm import LLM
except ImportError:
    print("vllm is not installed in this environment; the patch above is")
    print("all the integration needed — install vllm and rerun.")
    sys.exit(0)

llm = LLM(sys.argv[1] if len(sys.argv) > 1 else "zipnn/gpt2-ZipNN")
prompt = "Once upon a time,"
outputs = llm.generate([prompt])
print(outputs[0].outputs[0].text)
