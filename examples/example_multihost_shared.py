"""Cooperative whole-file compression with the TPU-optimal shared profile.

Every process compresses only its chunk range of one flat weights file.
Two collectives run: an all-reduce of the SAMPLED per-plane histograms
(``num_buf x 256`` ints — the shared-table format policy histograms every
8th chunk at >= 512 chunks), from which every host builds the identical
global Huffman table, and the usual all-gather of per-cell sizes for the
in-place container assembly.  The output is byte-identical to a
single-host ``ZipNN(huffman_table="shared").compress`` — the profile the
fused TPU decode path likes best — no matter how many processes ran.

Single-machine demo (2 processes on CPU):

    python examples/example_multihost_shared.py

On a real multi-host slice, run one process per host with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set and skip
the self-spawning block.

Reference equivalent: the single-host compress entry
(/root/reference/scripts/zipnn_compress_file.py:104) — the reference has
no multi-host mode and no shared-table profile at all.
"""
import os as _os
import subprocess
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(
    _os.sys.argv[0] if __name__ == "__main__" else __file__)))
_sys.path.insert(0, _REPO)

CHUNK = 4096  # small chunks so the demo file crosses the 512-chunk
# sampling gate; production uses the 256 KB default


def worker(port: str, pid: str, nproc: str, src: str, out: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from zipnn_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", int(nproc), int(pid))
    multihost.compress_file_multihost(
        src, out, bytearray_dtype="bfloat16", compression_chunk=CHUNK,
        huffman_table="shared",
    )
    dec = out + ".dec"
    multihost.decompress_file_multihost(out, dec)
    if jax.process_index() == 0:
        print(f"[worker0] wrote {out} ({_os.path.getsize(out)} bytes)")


def main() -> None:
    import socket

    import numpy as np

    src = "/tmp/example_mh_shared/weights.bin"
    out = "/tmp/example_mh_shared/weights.bin.znn"
    _os.makedirs("/tmp/example_mh_shared", exist_ok=True)
    rng = np.random.default_rng(1)
    vals = (rng.standard_normal(2 * 1024 * 1024) * 0.05).astype(np.float32)
    data = ((vals.view(np.uint32) >> 16).astype("<u2")).tobytes()
    with open(src, "wb") as f:
        f.write(data)

    s = socket.socket()
    s.bind(("localhost", 0))
    port = str(s.getsockname()[1])
    s.close()

    procs = [
        subprocess.Popen(
            [_sys.executable, _os.path.abspath(__file__),
             "--worker", port, str(pid), "2", src, out],
            env=dict(_os.environ, JAX_PLATFORMS="cpu",
                     PYTHONPATH=_REPO),
        )
        for pid in range(2)
    ]
    for p in procs:
        assert p.wait(timeout=300) == 0

    from zipnn_tpu import ZipNN

    golden = ZipNN(
        engine="numpy", input_format="byte", bytearray_dtype="bfloat16",
        compression_chunk=CHUNK, huffman_table="shared",
    ).compress(data)
    got = open(out, "rb").read()
    assert got == bytes(golden), "multi-process shared container diverged"
    assert open(out + ".dec", "rb").read() == data
    print(f"2-process shared-profile container: {len(got)} bytes "
          f"(ratio {len(got) / len(data):.4f}), byte-identical to "
          f"single-host, decode bit-exact")


if __name__ == "__main__":
    if len(_sys.argv) > 1 and _sys.argv[1] == "--worker":
        worker(*_sys.argv[2:7])
    else:
        main()
