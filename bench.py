"""Headline benchmark: giant-steps/s on one chip at the north-star config.

Prints ONE JSON line:
  {"metric": "giant_steps_per_s_per_chip", "value": N, "unit": "steps/s",
   "vs_baseline": R}

Semantics match the reference's rate counter (giant landings probed;
1_9_7File.pb:2371,5131-5135 — its "MKeys/s" display is giant-steps/s, and
effective keys/s = giant-steps/s * 2w).

Baseline: the reference publishes no throughput numbers (BASELINE.md).
The comparison constant below is a DERIVED estimate for the reference on
an RTX 3070 from its published launch geometry (-t 256 -b 138 -p 244 ->
8.6M adds -> 17.2M landings per launch, README.md:33-34) under an assumed
~20 launches/s for that card class => ~3.5e8 giant-steps/s. Replace with a
measured number when one exists.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_GIANT_STEPS_PER_S = 3.5e8  # derived estimate, see module docstring

# Bench geometry: w = 2^26 table is the north-star metric point
# (BASELINE.json); scale down via env for smoke runs.
W_BITS = int(os.environ.get("BENCH_W_BITS", "26"))
N_OFFSETS = int(os.environ.get("BENCH_N_OFFSETS", str(1 << 18)))
JOBS = int(os.environ.get("BENCH_JOBS", "4"))
CHUNK = int(os.environ.get("BENCH_CHUNK", "256"))


def main():
    import jax
    from bsgs_tpu.models import solver as smod
    from bsgs_tpu.utils import artifacts, ecpy

    w = 1 << W_BITS
    htsz = max(4, W_BITS - 2)
    cfg = smod.SolverConfig(
        w=w, htsz=htsz, n_offsets=N_OFFSETS, jobs_per_epoch=JOBS,
        window=16, chunk=CHUNK, table_tile=1 << 18,
    )
    t0 = time.time()
    baby = artifacts.get_baby_table(
        w, htsz, window=16, cache_dir=os.environ.get(
            "BENCH_CACHE", "/root/repo/.bench_cache"),
        tile=cfg.table_tile,
    )
    t_table = time.time() - t0
    s = smod.Solver(cfg, baby=baby)

    # a pubkey with no key in the scanned region: pure-throughput scan
    pub = ecpy.mul((1 << 200) + 12345)
    pk = 1 << 40

    # warmup (compile)
    res = s.solve(pub, pk, pk + cfg.keys_per_epoch - 1, max_epochs=1)
    # timed run
    epochs = int(os.environ.get("BENCH_EPOCHS", "8"))
    t0 = time.time()
    res = s.solve(
        pub, pk, pk + epochs * cfg.keys_per_epoch - 1, max_epochs=epochs
    )
    dt = time.time() - t0
    rate = res.giant_steps / dt
    print(
        json.dumps(
            {
                "metric": "giant_steps_per_s_per_chip",
                "value": round(rate, 1),
                "unit": "steps/s",
                "vs_baseline": round(rate / BASELINE_GIANT_STEPS_PER_S, 3),
                "detail": {
                    "w_bits": W_BITS,
                    "n_offsets": N_OFFSETS,
                    "jobs_per_epoch": JOBS,
                    "epochs": epochs,
                    "table_build_s": round(t_table, 1),
                    "scan_s": round(dt, 2),
                    "effective_keys_per_s": rate * 2 * w,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
