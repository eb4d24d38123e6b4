"""Warm-device job worker for interactive TPU experiments.

The tunnel's first contact costs minutes per process; this worker pays it
once and then execs job files in-process.  Drop ``NNN_name.py`` files into
/tmp/devjobs/; each runs with a persistent ``ENV`` dict as globals and its
stdout/traceback lands in ``NNN_name.out``.  Write ``stop`` into
/tmp/devjobs/STOP to exit.
"""
import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOBS = "/tmp/devjobs"
os.makedirs(JOBS, exist_ok=True)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# pay first contact now
t0 = time.time()
_ = np.asarray(jnp.zeros(1024, jnp.uint8)[:1])
print(f"worker ready, first contact {time.time()-t0:.1f}s", flush=True)

ENV = {"jax": jax, "jnp": jnp, "np": np, "time": time, "ENV": None}
ENV["ENV"] = ENV

done = set()
while not os.path.exists(os.path.join(JOBS, "STOP")):
    for name in sorted(os.listdir(JOBS)):
        if not name.endswith(".py") or name in done:
            continue
        done.add(name)
        out_path = os.path.join(JOBS, name[:-3] + ".out")
        buf = io.StringIO()
        old = sys.stdout
        sys.stdout = buf
        t0 = time.time()
        try:
            with open(os.path.join(JOBS, name)) as f:
                code = f.read()
            exec(compile(code, name, "exec"), ENV)
            status = "OK"
        except Exception:
            traceback.print_exc(file=buf)
            status = "FAIL"
        finally:
            sys.stdout = old
        with open(out_path, "w") as f:
            f.write(buf.getvalue())
            f.write(f"\n[{status} {time.time()-t0:.1f}s]\n")
        print(f"job {name}: {status}", flush=True)
    time.sleep(1)
print("worker stopped", flush=True)
