"""Pallas probe kernel: in-kernel double-buffered row DMAs.

Every probe number ever measured for this design went through XLA's
gather (~9.5 ns/row issue floor on v5e, PROFILE_r04 §2b). This kernel
re-implements the dense-row probe BELOW that layer: the scalar core
issues its own async row copies (pltpu.make_async_copy) from the
HBM-resident dense bucket matrix into a double-buffered VMEM stage,
with a full group of G rows outstanding while the previous group's rows
are compared on the VPU — the round-4 directive to test whether the
floor is XLA's descriptor path or the hardware's (VERDICT item 2a).
The reference's analogous decision point is its in-kernel binary search
probe (FOUNDINSORTNEW, bsgscudaussualHTchangeble1_7_3.pb PTX), which it
validated inside its own ISA.

Layout notes:
- buckets ride in as SCALAR-PREFETCH SMEM (the scalar core needs them to
  compute DMA source addresses before the vector pipeline touches data);
- discs arrive pre-transposed (G, n_groups) so the per-group comparand
  is a (G, 1) lane-column extract, matching the (G, 128) row stage's
  orientation without an in-kernel transpose;
- the found mask leaves as (G, n_groups) u32 and is untransposed by the
  XLA wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32


def _probe_dma_kernel(idx_ref, disc_ref, dense_ref, out_ref, rows, acc,
                      sem, *, G: int, n_groups: int, window: int):
    """Mosaic cannot index a single dynamic LANE column, so the per-group
    disc comparand is iota-selected out of its 128-group lane tile and
    the found columns accumulate in a scratch tile flushed per 128
    groups (lane-dim slices stay provably 128-aligned)."""

    def dma(g, k, slot):
        return pltpu.make_async_copy(
            dense_ref.at[idx_ref[g * G + k]],
            rows.at[slot, k],
            sem.at[slot],
        )

    def issue(g, slot):
        def body(k, _):
            dma(g, k, slot).start()
            return 0

        # full unroll: straight-line descriptor issue (Mosaic supports
        # only unroll=1 or unroll=num_steps)
        jax.lax.fori_loop(0, G, body, 0, unroll=G)

    def wait_all(g, slot):
        def body(k, _):
            dma(g, k, slot).wait()
            return 0

        jax.lax.fori_loop(0, G, body, 0)

    issue(0, 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1)

    def loop(g, _):
        slot = jax.lax.rem(g, 2)

        @pl.when(g + 1 < n_groups)
        def _():
            issue(g + 1, jax.lax.rem(g + 1, 2))

        wait_all(g, slot)
        tile0 = pl.multiple_of((g // 128) * 128, 128)
        lane = jax.lax.rem(g, 128)
        dtile = disc_ref[:, pl.ds(tile0, 128)]  # (G, 128) lane tile
        # one-hot select of lane g%128 as a signed SUM (single nonzero
        # per row, so bit-exact; Mosaic lacks unsigned reductions)
        dcol = jnp.sum(
            jnp.where(lanes == lane, dtile.astype(jnp.int32), 0),
            axis=1, keepdims=True,
        ).astype(_U32)  # (G, 1): group g's comparands
        found = jnp.any(rows[slot] == dcol, axis=1, keepdims=True)
        acc[:, :] = jnp.where(lanes == lane, found.astype(_U32), acc[:, :])

        @pl.when(jax.lax.rem(g, 128) == 127)
        def _():
            out_ref[:, pl.ds(tile0, 128)] = acc[:, :]

        return 0

    jax.lax.fori_loop(0, n_groups, loop, 0)


@functools.partial(
    jax.jit, static_argnames=("group", "interpret")
)
def probe_rows_dma(bucket, disc, dense, *, group: int = 256,
                   interpret: bool = False):
    """found[i] = any(dense[bucket[i], :] == disc[i]) via in-kernel DMAs.

    bucket/disc are (m,) uint32 with m % group == 0; dense is the
    (2^htsz, window) dense bucket matrix (stays in HBM; rows are staged
    through VMEM by the kernel's own copies). Drop-in replacement for
    models/table.probe_keys at the same contract.
    """
    m = bucket.shape[0]
    G = group
    assert m % (G * 128) == 0, (m, G)  # whole 128-group lane tiles
    n_groups = m // G
    window = dense.shape[1]
    disc_t = disc.reshape(n_groups, G).T  # (G, n_groups)
    out = pl.pallas_call(
        functools.partial(_probe_dma_kernel, G=G, n_groups=n_groups,
                          window=window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # disc_t
                pl.BlockSpec(memory_space=pltpu.ANY),  # dense (HBM)
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, G, window), jnp.uint32),
                pltpu.VMEM((G, 128), jnp.uint32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((G, n_groups), jnp.uint32),
        interpret=interpret,
    )(bucket.astype(jnp.int32), disc_t, dense)
    return out.T.reshape(m) != 0
