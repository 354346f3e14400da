"""Persistent TPU job driver for the axon transport.

The axon relay grants the chip to ONE process at a time and a fresh
process's first execution blocks on a claim handshake measured at
90 s - 30 min (PROFILE_r04.md §1). Running experiments as separate
processes therefore serializes on re-claims; this driver claims once and
then executes job files in-process:

  python tools/tpu_driver.py            # claims, then polls .tpu_jobs/
  echo '<python>' > .tpu_jobs/01_foo.py # job runs, output -> 01_foo.out

Jobs run with exec() in a fresh namespace that shares a persistent
``STATE`` dict (cache tables/solvers across jobs) and ``FORCE`` (a
readback-based completion fence — block_until_ready is a no-op on this
transport). Writing a file named STOP shuts the driver down.
"""

import io
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
JOBS = os.path.join(REPO, ".tpu_jobs")

from bsgs_tpu.utils import compile_cache

compile_cache.enable()


def force(x):
    import numpy as np
    import jax.numpy as jnp

    return np.asarray(jnp.sum(jnp.ravel(x).astype(jnp.uint32)))


def main():
    os.makedirs(JOBS, exist_ok=True)
    import numpy as np
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    claim = time.time() - t0
    with open(os.path.join(JOBS, "CLAIMED"), "w") as f:
        f.write(f"{claim:.1f}s {jax.devices()[0]}\n")
    print(f"claimed in {claim:.1f}s: {jax.devices()[0]}", flush=True)

    state = {}
    while True:
        if os.path.exists(os.path.join(JOBS, "STOP")):
            print("STOP seen, exiting", flush=True)
            return
        pend = sorted(
            f for f in os.listdir(JOBS)
            if f.endswith(".py") and not os.path.exists(
                os.path.join(JOBS, f + ".done"))
        )
        if not pend:
            time.sleep(0.5)
            continue
        name = pend[0]
        path = os.path.join(JOBS, name)
        with open(path) as f:
            src = f.read()
        print(f"--- running {name}", flush=True)
        buf = io.StringIO()
        t0 = time.time()
        ns = {"STATE": state, "FORCE": force, "REPO": REPO, "print":
              lambda *a, **k: print(*a, **{**k, "file": buf, "flush": True})}
        try:
            exec(compile(src, name, "exec"), ns)
            status = "ok"
        except Exception:
            traceback.print_exc(file=buf)
            status = "FAIL"
        dt = time.time() - t0
        out = buf.getvalue()
        with open(path + ".out", "w") as f:
            f.write(out + f"\n[{status} in {dt:.1f}s]\n")
        open(path + ".done", "w").close()
        print(out, flush=True)
        print(f"--- {name}: {status} in {dt:.1f}s", flush=True)


if __name__ == "__main__":
    main()
