"""Cooperative per-tensor safetensors compression across processes.

Each process compresses only its (deterministic, size-balanced) shard of
the tensors and pwrites into ONE ``.znn.safetensors`` output; a single
all-gather (2 ints per tensor) is the only communication.  The result is
byte-identical to a single-process run and loads transparently through
``zipnn_safetensors()`` / ``SafeOpen`` (reference ``znn_compressed_vectors``
schema, zipnn/util_safetensors.py:9-58).

Single-machine demo (2 processes on CPU):

    python examples/example_multihost_safetensors.py

On a real multi-host slice, run one process per host with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set and skip
the self-spawning block.
"""
import os as _os
import subprocess
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(_os.sys.argv[0] if __name__ == "__main__" else __file__)))
_sys.path.insert(0, _REPO)


def worker(port: str, pid: str, nproc: str, src: str, out: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from zipnn_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", int(nproc), int(pid))
    multihost.compress_safetensors_multihost(src, out, engine="auto")
    if jax.process_index() == 0:
        print(f"[worker0] wrote {out} ({_os.path.getsize(out)} bytes)")


def main() -> None:
    import socket

    import torch
    from safetensors.torch import save_file

    src = "/tmp/example_mh/model.safetensors"
    out = "/tmp/example_mh/model.znn.safetensors"
    _os.makedirs("/tmp/example_mh", exist_ok=True)
    g = torch.Generator().manual_seed(1)
    save_file(
        {
            "w1": (torch.randn(512, 768, generator=g) * 0.05).to(torch.bfloat16),
            "w2": (torch.randn(768, 512, generator=g) * 0.02).to(torch.bfloat16),
            "bias": torch.zeros(768),
            "steps": torch.arange(10, dtype=torch.int64),
        },
        src,
        metadata={"format": "pt"},
    )

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    procs = [
        subprocess.Popen(
            [_sys.executable, _os.path.abspath(__file__), "--worker",
             str(port), str(pid), "2", src, out],
            env=dict(_os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=_REPO),
        )
        for pid in range(2)
    ]
    for p in procs:
        assert p.wait() == 0

    # load through the transparent plugin layer
    from zipnn_tpu.plugins.safetensors import SafeOpen

    with SafeOpen(out, "pt", "cpu") as f:
        for name in ("w1", "w2", "bias", "steps"):
            t = f.get_tensor(name)
            print(f"{name}: {tuple(t.shape)} {t.dtype}")
    print("sizes:", _os.path.getsize(src), "->", _os.path.getsize(out))


if __name__ == "__main__":
    if len(_sys.argv) > 1 and _sys.argv[1] == "--worker":
        worker(*_sys.argv[2:7])
    else:
        main()
