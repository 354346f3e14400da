"""Capability + speed probe: which dynamic-gather forms lower in Mosaic?

The probe redesign needs per-lane dynamic indexing into a VMEM-resident
table tile inside a Pallas kernel. This script tries every plausible form
on the real chip and times the ones that compile:

  A. jnp.take_along_axis(tab, idx, axis=0): (S, 128) table, (B, 128)
     per-lane sublane indices
  B. same with axis=1 (per-sublane lane indices)
  C. tab[idx] via jnp.take along axis 0
  D. one-hot matmul membership (MXU fallback), for cost calibration
  E. brute compare: B probes x S entries elementwise on the VPU
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_case(name, build):
    try:
        fn, args, ref = build()
        out = np.asarray(fn(*args))
        ok = ref is None or np.array_equal(out, ref)
        # quick timing: 10 reps chained is overkill here; just 5 calls
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(*args)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / 20
        print(f"[OK ] {name:50s} correct={ok} {dt*1e3:8.3f} ms")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:140]
        print(f"[ERR] {name:50s} {type(e).__name__}: {msg}")


def main():
    rng = np.random.default_rng(3)
    S, B = 512, 1024  # table sublane rows, probe rows (x128 lanes)

    tab = jnp.asarray(rng.integers(0, 2**31, (S, 128), np.int64).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, S, (B, 128), np.int64).astype(np.int32))
    ref_a = np.take_along_axis(np.asarray(tab), np.asarray(idx) % S, axis=0) if B <= S else None

    def case_a():
        def k(tab_ref, idx_ref, out_ref):
            out_ref[:, :] = jnp.take_along_axis(tab_ref[:, :], idx_ref[:, :], axis=0)

        fn = jax.jit(lambda t, i: pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        )(t, i))
        ref = np.take_along_axis(
            np.asarray(tab), np.asarray(idx), axis=0
        ) if S >= B else None
        # take_along_axis with axis=0 needs idx rows <= tab rows? shapes:
        # tab (S,128), idx (B,128) -> out (B,128); numpy allows B != S.
        ref = np.asarray(tab)[np.asarray(idx), np.arange(128)[None, :]]
        return fn, (tab, idx), ref

    run_case("pallas take_along_axis axis=0 (S=512,B=1024)", case_a)

    idx_l = jnp.asarray(rng.integers(0, 128, (B, 128), np.int64).astype(np.int32))
    tabB = jnp.asarray(rng.integers(0, 2**31, (B, 128), np.int64).astype(np.int32))

    def case_b():
        def k(tab_ref, idx_ref, out_ref):
            out_ref[:, :] = jnp.take_along_axis(tab_ref[:, :], idx_ref[:, :], axis=1)

        fn = jax.jit(lambda t, i: pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        )(t, i))
        ref = np.take_along_axis(np.asarray(tabB), np.asarray(idx_l), axis=1)
        return fn, (tabB, idx_l), ref

    run_case("pallas take_along_axis axis=1 (lane gather)", case_b)

    def case_c():
        def k(tab_ref, idx_ref, out_ref):
            out_ref[:, :] = jnp.take(tab_ref[:, :], idx_ref[:, :], axis=0)[
                :, :, 0
            ] if False else tab_ref[:, :][idx_ref[:, :]]

        fn = jax.jit(lambda t, i: pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 128, 128), jnp.int32),
        )(t, i))
        return fn, (tab, idx), None

    run_case("pallas tab[idx] advanced indexing", case_c)

    # D: one-hot matmul membership against S-row table tile (MXU)
    def case_d():
        def k(tab_ref, idx_ref, out_ref):
            # one-hot (B*? ) too big; do per-128 block
            oh = (idx_ref[:, :, None] == jax.lax.broadcasted_iota(
                jnp.int32, (B, 128, 8), 2)).astype(jnp.float32)
            out_ref[:, :] = jnp.sum(oh, axis=2).astype(jnp.int32)

        fn = jax.jit(lambda t, i: pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        )(t, i))
        return fn, (tab, idx), None

    run_case("pallas 3D one-hot iota compare (8 deep)", case_d)

    # E: brute compare B probes vs S entries (VPU) - membership of
    # disc (B,128) in table column tile (S,128)? That compares different
    # lanes... measure raw elementwise throughput instead: S passes.
    disc = jnp.asarray(rng.integers(0, 2**31, (B, 128), np.int64).astype(np.int32))

    def case_e():
        S_SMALL = 32

        def k(tab_ref, d_ref, out_ref):
            acc = jnp.zeros((B, 128), jnp.int32)
            for s in range(S_SMALL):
                acc = acc | (d_ref[:, :] == tab_ref[s, 0]).astype(jnp.int32)
            out_ref[:, :] = acc

        fn = jax.jit(lambda t, d: pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        )(t, d))
        return fn, (tab, disc), None

    run_case("pallas brute scalar-broadcast compare (32 deep)", case_e)

    # F: XLA (non-pallas) take_along_axis on same shapes, for comparison
    def case_f():
        fn = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=0))
        ref = np.asarray(tab)[np.asarray(idx), np.arange(128)[None, :]]
        return fn, (tab, idx), ref

    run_case("XLA take_along_axis axis=0 (per-lane sublane)", case_f)

    # G: XLA gather, sorted vs unsorted, 1D word into 2^24
    rows = 1 << 24
    tab1 = jnp.asarray(rng.integers(0, 2**31, rows, np.int64).astype(np.int32))
    M = 1 << 21
    gi = rng.integers(0, rows, M, np.int64).astype(np.int32)
    gid = jnp.asarray(gi)
    gis = jnp.asarray(np.sort(gi))

    def case_g():
        fn = jax.jit(lambda i: tab1[i])
        return fn, (gid,), None

    run_case("XLA 1D word gather 2^21 of 2^24 (unsorted)", case_g)

    def case_h():
        fn = jax.jit(lambda i: jnp.take(tab1, i, indices_are_sorted=True))
        return fn, (gis,), None

    run_case("XLA 1D word gather 2^21 of 2^24 (sorted+hint)", case_h)

    def case_i():
        fn = jax.jit(lambda i: jax.lax.sort_key_val(i, i)[0])
        return fn, (gid,), None

    run_case("XLA sort_key_val 2^21 (i32,i32)", case_i)


if __name__ == "__main__":
    main()
