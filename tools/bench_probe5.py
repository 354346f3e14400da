"""K-way interleaved gather overlap: how deep does the gather pipeline go?

bench_probe4 found two independent XLA gathers in one program cost 20.8
ns/elt vs 37.6 for one — they overlap. This sweeps k parallel gathers
(same total element count) and element widths to find the floor.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 10
M_TOTAL = 1 << 22


def timeit_chain(name, step, x0, per, reps=REPS):
    x = step(x0)
    np.asarray(jax.tree.leaves(x)[0])
    x = x0
    t0 = time.perf_counter()
    for _ in range(reps):
        x = step(x)
    np.asarray(jax.tree.leaves(x)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:58s} {dt*1e3:8.2f} ms {dt/per*1e9:7.2f} ns/elt")
    return dt


def main():
    rng = np.random.default_rng(5)

    for dtype, bits, logr in (
        (np.uint16, 16, 26),
        (np.uint32, 32, 26),
        (np.uint16, 16, 27),
    ):
        rows = 1 << logr
        tab = jnp.asarray(rng.integers(0, 2**bits - 1, rows, np.int64
                                       ).astype(dtype))

        for k in (1, 2, 4, 8, 16):
            m = M_TOTAL // k
            idxs = tuple(
                jnp.asarray(rng.integers(0, rows, m, np.int64
                                         ).astype(np.int32))
                for _ in range(k)
            )

            @jax.jit
            def g(ii, t):
                outs = []
                for i in ii:
                    v = t[i]
                    outs.append(
                        (i * 1664525 + 1013904223
                         + (v & 1).astype(jnp.int32)) % t.shape[0])
                return tuple(outs)

            timeit_chain(
                f"u{bits} 2^{logr} gather {k}x2^{int(np.log2(m))}",
                lambda ii: g(ii, tab), idxs, M_TOTAL)


if __name__ == "__main__":
    main()
