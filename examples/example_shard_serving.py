"""Multi-shard checkpoint serving: a whole model load in grouped dispatches.

A model load decodes MANY similar containers (checkpoint shards) back to
back; per-shard fixed costs — host plan, dispatch latency, validation
sync — bound a naive loop, not the kernels.  ``ShardDecoder`` stages
every shard's device inputs, groups same-geometry shards into stacked
bundles (one fused dispatch each, capped by the HBM batch budget), and
resolves every shard's validation in ONE device fetch.

The serving-side replacement for the reference's whole-file streaming
loader (zipnn/zipnn.py:1268-1358).  Runs on a real TPU; on CPU the
staged fast path is unavailable and the same call transparently decodes
through the host path.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from zipnn_tpu import ZipNN
from zipnn_tpu.io.serving import ShardDecoder

# --- offline: compress N checkpoint shards ---------------------------------
rng = np.random.default_rng(0)


def synth_shard(nbytes: int) -> bytes:
    """bf16-weight-shaped bytes (gaussian exponents, noisy mantissas)."""
    w = (rng.standard_normal(nbytes // 2) * 0.05).astype(np.float32)
    return np.asarray(w, dtype=np.float16).view(np.uint8)[:nbytes].tobytes()


shards = [synth_shard(8 << 20) for _ in range(4)]
z = ZipNN(bytearray_dtype="bfloat16")
blobs = [bytes(z.compress(s)) for s in shards]
print(f"compressed {len(blobs)} shards, "
      f"ratio {sum(map(len, blobs)) / sum(map(len, shards)):.3f}")

# --- serving: stage -> group -> decode the whole load ----------------------
dec = ShardDecoder(to_device=True, as_numpy=True)

staged = [dec.stage(b) for b in blobs]
if all(s is not None for s in staged):
    # stage-time (overlappable with the previous load's decode): bundle
    # construction + every host->device upload
    groups = dec.stack_groups(staged)
    # hot path: dispatches only, one validation fetch for the whole load
    outs = dec.decompress_groups(groups)
    kind = "stacked bundles (TPU fast path)"
else:
    # non-fast-path containers (or no TPU): same call, host decode
    outs = dec.decompress_all(blobs)
    kind = "host fallback"

for out, want in zip(outs, shards):
    got = out.tobytes() if hasattr(out, "tobytes") else bytes(out)
    assert got == want
print(f"decoded {len(outs)} shards via {kind}: bit-exact")
