# Layer transparent .znn decompression into any serving image (vLLM,
# sglang, TGI, ...): every Python process in the image gets
# zipnn_tpu.zipnn_safetensors() applied at interpreter start via site
# usercustomize, so compressed checkpoints load with zero code changes.
#
#   docker build --build-arg BASE_IMAGE=<base:tag> -t <base>:zipnn-tpu .
#
# Reference equivalent: /root/reference Dockerfile (pip zipnn +
# usercustomize hook); this installs the local zipnn_tpu tree instead.
ARG BASE_IMAGE
FROM ${BASE_IMAGE}

USER root
COPY . /opt/zipnn_tpu
RUN pip install /opt/zipnn_tpu

RUN python3 - <<'EOF'
import os
from site import getsitepackages

path = os.path.join(getsitepackages()[0], "usercustomize.py")
with open(path, "w") as f:
    f.write("from zipnn_tpu import zipnn_safetensors\nzipnn_safetensors()\n")
EOF
