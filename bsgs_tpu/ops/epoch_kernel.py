"""Fused Pallas kernels for the giant-step epoch math.

TPU re-design of the reference GPU kernel `_test1`'s two stages (decoded
PTX, bsgscudaussualHTchangeble1_7_3.pb:4979-6862 — STAGE 1 beginBatchAdd
denominator products, STAGE 2 completeBatchAddWithDouble slope/newX walk):

- Kernel A (``_fwd_kernel``): per (center t, offset-block jb), walk C chunks
  of W lanes; compute denominators d = Ox - Mx, the running Montgomery
  prefix products (exclusive), and the chunk-group totals. One modular
  multiply per element, everything VMEM-resident.
- The totals are inverted between kernels with the existing recursive
  Montgomery batch inversion (ops/ec.batch_inv) — one Fermat for the whole
  epoch, amortized twice over.
- Kernel B (``_bwd_kernel``): walk the chunks backwards recovering each
  lane's inverse with two multiplies, then the fused landing math: slopes
  for M+O and M-O (x2GS symmetry sharing one inverse), landing X's, 64-bit
  X prefixes, and the (bucket, disc) probe keys. Output is a single
  (8, T*N) uint32 plane: rows 0-4 = bucket+, disc+, bucket-, disc-, exact.

Why two kernels: the Montgomery trick needs ALL forward products before the
first backward step; splitting at the inversion turns that barrier into a
tiny XLA region and keeps each kernel a simple resident loop. The prefix
round-trip costs 64 B/pair of HBM traffic — microseconds per epoch —
while keeping every multiply chain fused in VMEM (the row-major XLA path
materialized a (B, 16, 16) outer product to HBM per multiply, ~100x slower).

Layouts are planar (16, W) uint32 limb planes (ops/planar.py): full
8x128-lane VPU utilization; the limb axis lives in sublanes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field as F, planar as P

_U32 = jnp.uint32




def _fwd_kernel(ox_ref, cx_ref, pre_ref, tot_ref, *, C: int, W: int):
    cx = cx_ref[:, 0:1]  # (16, 1) broadcast over lanes

    def body(c, run):
        sl = pl.ds(c * W, W)
        d = P.sub_mod(ox_ref[:, sl], cx)
        d = P.select(P.is_zero(d), P.one_col(), d)
        pre_ref[:, sl] = run
        return P.mul_mod(run, d)

    run = jax.lax.fori_loop(
        0, C, body, jnp.broadcast_to(P.one_col(), (F.NLIMBS, W))
    )
    tot_ref[:, :] = run


def _bwd_kernel(
    ox_ref, oy_ref, cx_ref, cy_ref, pre_ref, itot_ref, out_ref,
    *, C: int, W: int, htsz: int,
):
    cx = cx_ref[:, 0:1]
    cy = cy_ref[:, 0:1]

    def body(i, run):
        c = C - 1 - i
        sl = pl.ds(c * W, W)
        ox = ox_ref[:, sl]
        oy = oy_ref[:, sl]
        d = P.sub_mod(ox, cx)
        exact = P.is_zero(d)
        d = P.select(exact, P.one_col(), d)
        inv_x = P.mul_mod(run, pre_ref[:, sl])
        run = P.mul_mod(run, d)
        # x(M + O): lambda = (Oy - My) / (Ox - Mx)
        lam_p = P.mul_mod(P.sub_mod(oy, cy), inv_x)
        xp = P.sub_mod(P.sub_mod(P.sqr_mod(lam_p), cx), ox)
        # x(M - O): lambda' = (-Oy - My) / (Ox - Mx) = -(Oy + My) * inv;
        # only its square enters the landing X.
        lam_m = P.mul_mod(P.add_mod(oy, cy), inv_x)
        xm = P.sub_mod(P.sub_mod(P.sqr_mod(lam_m), cx), ox)
        hp_hi, hp_lo = P.x_prefix64(xp)
        hm_hi, hm_lo = P.x_prefix64(xm)
        bp, dp = P.bucket_disc(hp_hi, hp_lo, htsz)
        bm, dm = P.bucket_disc(hm_hi, hm_lo, htsz)
        out_ref[0:1, sl] = bp
        out_ref[1:2, sl] = dp
        out_ref[2:3, sl] = bm
        out_ref[3:4, sl] = dm
        out_ref[4:5, sl] = exact.astype(_U32)
        out_ref[5:, sl] = jnp.zeros((3, W), _U32)
        return run

    jax.lax.fori_loop(0, C, body, itot_ref[:, :])


# ---------------------------------------------------------------------------
# Planar batch inversion (Pallas): Montgomery fold + in-kernel Fermat.


def _mont_fwd_kernel(v_ref, pre_ref, tot_ref, *, C: int, W: int):
    """Forward Montgomery pass over nonzero values: exclusive prefix
    products per lane chain + chunk-group totals."""

    def body(c, run):
        sl = pl.ds(c * W, W)
        pre_ref[:, sl] = run
        return P.mul_mod(run, v_ref[:, sl])

    run = jax.lax.fori_loop(
        0, C, body, jnp.broadcast_to(P.one_col(), (F.NLIMBS, W))
    )
    tot_ref[:, :] = run


def _mont_bwd_kernel(v_ref, pre_ref, itot_ref, out_ref, *, C: int, W: int):
    def body(i, run):
        c = C - 1 - i
        sl = pl.ds(c * W, W)
        out_ref[:, sl] = P.mul_mod(run, pre_ref[:, sl])
        return P.mul_mod(run, v_ref[:, sl])

    jax.lax.fori_loop(0, C, body, itot_ref[:, :])


def _fermat_kernel(x_ref, out_ref):
    out_ref[:, :] = P.inv_mod_chain(x_ref[:, :])


_FERMAT_MAX = 1 << 13  # widest batch the direct Fermat kernel takes


def batch_inv_planar(v, *, chunk_c: int = 64, lanes_w: int = 256,
                     interpret: bool = False):
    """Elementwise inverse of a planar (16, M) batch of NONZERO values,
    entirely in Pallas: one Montgomery fold level (per-lane chains of
    chunk_c), then a single in-kernel Fermat addition-chain inversion of
    the fold totals (planar.inv_mod_chain — 255 squarings + 15 multiplies
    at full lane width). The planar twin of ops/ec.batch_inv, built for
    the epoch hot path where the XLA scan-based inversion dominated.
    """
    nl = F.NLIMBS
    m = v.shape[1]
    C, W = chunk_c, lanes_w
    if m > _FERMAT_MAX:
        pad = (-m) % (C * W)
        if pad:
            ones = jnp.broadcast_to(P.one_col(), (nl, pad))
            return batch_inv_planar(
                jnp.concatenate([v, ones], axis=1),
                chunk_c=C, lanes_w=W, interpret=interpret,
            )[:, :m]
        blocks = m // (C * W)
        b_spec = pl.BlockSpec((nl, C * W), lambda b: (0, b),
                              memory_space=pltpu.VMEM)
        t_spec = pl.BlockSpec((nl, W), lambda b: (0, b),
                              memory_space=pltpu.VMEM)
        pre, tot = pl.pallas_call(
            functools.partial(_mont_fwd_kernel, C=C, W=W),
            grid=(blocks,),
            in_specs=[b_spec],
            out_specs=[b_spec, t_spec],
            out_shape=[
                jax.ShapeDtypeStruct((nl, m), jnp.uint32),
                jax.ShapeDtypeStruct((nl, blocks * W), jnp.uint32),
            ],
            interpret=interpret,
        )(v)
        itot = batch_inv_planar(tot, chunk_c=C, lanes_w=W,
                                interpret=interpret)
        return pl.pallas_call(
            functools.partial(_mont_bwd_kernel, C=C, W=W),
            grid=(blocks,),
            in_specs=[b_spec, b_spec, t_spec],
            out_specs=b_spec,
            out_shape=jax.ShapeDtypeStruct((nl, m), jnp.uint32),
            interpret=interpret,
        )(v, pre, itot)
    return pl.pallas_call(
        _fermat_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nl, m), jnp.uint32),
        interpret=interpret,
    )(v)


# ---------------------------------------------------------------------------
# Planar batched add of a common point: the table-generation hot loop.


def _addc_kernel(xs_ref, ys_ref, inv_ref, cx_ref, cy_ref,
                 x3_ref, y3_ref, pre_ref):
    """(xs, ys) + C lane-wise, inv = 1/den precomputed (den = Cx - x, or 2y
    on the doubling lanes x == Cx — generation only ever hits P == +C, see
    add_const_planar). Also emits the 64-bit X prefix of the result."""
    cx = cx_ref[:, 0:1]
    cy = cy_ref[:, 0:1]
    xs = xs_ref[:, :]
    ys = ys_ref[:, :]
    inv = inv_ref[:, :]
    exact = P.is_zero(P.sub_mod(cx, xs))
    x2 = P.sqr_mod(xs)
    num = P.select(exact, P.add_mod(P.add_mod(x2, x2), x2),
                   P.sub_mod(cy, ys))
    lam = P.mul_mod(num, inv)
    # on exact (doubling) lanes cx == xs, so xs + cx == 2x in both cases
    x3 = P.sub_mod(P.sqr_mod(lam), P.add_mod(xs, cx))
    y3 = P.sub_mod(P.mul_mod(lam, P.sub_mod(xs, x3)), ys)
    x3_ref[:, :] = x3
    y3_ref[:, :] = y3
    hi, lo = P.x_prefix64(x3)
    pre_ref[0:1, :] = hi
    pre_ref[1:2, :] = lo
    pre_ref[2:, :] = jnp.zeros((6, hi.shape[1]), _U32)


@functools.partial(
    jax.jit, static_argnames=("blk", "chunk_c", "lanes_w", "interpret")
)
def add_const_planar(xs, ys, cx_col, cy_col, *, blk: int = 2048,
                     chunk_c: int = 64, lanes_w: int = 256,
                     interpret: bool = False):
    """Planar (16, M) batch + one common point C, fused in Pallas with one
    shared batch inversion — the generation twin of ops/ec.add_common
    (reference completeBatchAddWithDouble, lib/Curve64.pb:2946-3031), ~20x
    the row-major XLA path's throughput on TPU.

    Handles x == Cx lanes as doublings (P == +C): correct for multiples
    generation where P == -C cannot occur (indices never sum to 0 mod n).
    Returns (x3, y3, prefix_hi, prefix_lo) with prefixes of x3.
    """
    nl = F.NLIMBS
    m = xs.shape[1]
    assert m % blk == 0, (m, blk)
    exact = P.is_zero(P.sub_mod(cx_col, xs))
    den = P.select(exact, P.add_mod(ys, ys), P.sub_mod(cx_col, xs))
    inv = batch_inv_planar(den, chunk_c=chunk_c, lanes_w=lanes_w,
                           interpret=interpret)
    cxw = jnp.broadcast_to(cx_col, (nl, 128))
    cyw = jnp.broadcast_to(cy_col, (nl, 128))
    b_spec = pl.BlockSpec((nl, blk), lambda b: (0, b),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((nl, 128), lambda b: (0, 0),
                          memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((8, blk), lambda b: (0, b),
                          memory_space=pltpu.VMEM)
    x3, y3, pre = pl.pallas_call(
        _addc_kernel,
        grid=(m // blk,),
        in_specs=[b_spec, b_spec, b_spec, c_spec, c_spec],
        out_specs=[b_spec, b_spec, p_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nl, m), jnp.uint32),
            jax.ShapeDtypeStruct((nl, m), jnp.uint32),
            jax.ShapeDtypeStruct((8, m), jnp.uint32),
        ],
        interpret=interpret,
    )(xs, ys, inv, cxw, cyw)
    return x3, y3, pre[0], pre[1]


@jax.jit
def _fill_place(xs, ys, x3, y3, have):
    """Place lanes [0, have) of (x3, y3) at [have, 2*have) of (xs, ys).

    have is TRACED so every doubling pass reuses one compiled program
    (an eager x3[:, :have] slice + update would recompile per pass)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, xs.shape, 1)
    m = (lane >= have) & (lane < 2 * have)
    return (
        jnp.where(m, jnp.roll(x3, have, axis=1), xs),
        jnp.where(m, jnp.roll(y3, have, axis=1), ys),
    )


def fill_multiples_planar(base_pt, step_pt, n: int, seed: int = 1024,
                          interpret: bool = False):
    """Planar (16, n) x/y arrays of [base + i*step, i = 0..n-1], built by
    doubling-fill passes (reference fillarrayN, lib/Curve64.pb:3033-3065)
    that run ENTIRELY in the fused planar kernel: a tiny host-exact seed
    row, then log2(n/seed) full-width add_const_planar passes (the arrays
    stay at their final width so every pass reuses one compiled kernel;
    garbage in not-yet-filled lanes never feeds a filled lane).

    base/step are host-int affine points; no lane may be the point at
    infinity (generation patterns guarantee indices never sum to 0 mod n).
    """
    from ..utils import ecpy
    from . import ec

    assert n >= 2048 and n % 2048 == 0, n
    assert n & (n - 1) == 0, n
    seed = min(seed, n)
    sx, sy, sinf = ec.host_row(base_pt, step_pt, seed)
    assert not sinf.any(), "infinity lane in planar fill seed"
    xs0 = np.zeros((F.NLIMBS, n), np.uint32)
    ys0 = np.zeros((F.NLIMBS, n), np.uint32)
    xs0[:, :seed] = sx.T
    ys0[:, :seed] = sy.T
    xs, ys = jnp.asarray(xs0), jnp.asarray(ys0)
    have = seed
    while have < n:
        c_pt = ecpy.mul(have, step_pt)
        cxc = jnp.asarray(P.const_col(c_pt[0]))
        cyc = jnp.asarray(P.const_col(c_pt[1]))
        x3, y3, _, _ = add_const_planar(xs, ys, cxc, cyc,
                                        interpret=interpret)
        xs, ys = _fill_place(xs, ys, x3, y3, np.int32(have))
        have *= 2
    return xs, ys


@functools.partial(
    jax.jit,
    static_argnames=("htsz", "chunk_c", "lanes_w", "interpret"),
)
def epoch_landing_keys(
    centers_x_pl,
    centers_y_pl,
    ox_pl,
    oy_pl,
    *,
    htsz: int,
    chunk_c: int = 64,
    lanes_w: int = 256,
    interpret: bool = False,
):
    """All probe keys of one epoch: T centers x N offsets.

    Inputs are planar: centers (16, T), offsets (16, N) with
    N % (chunk_c * lanes_w) == 0. Returns a (8, T*N) uint32 plane
    (rows: bucket+, disc+, bucket-, disc-, exact; pair order t*N + j)
    — flat pair indices match models/giant.decode_flat.
    """
    nl = F.NLIMBS
    t_jobs = centers_x_pl.shape[1]
    n = ox_pl.shape[1]
    C, W = chunk_c, lanes_w
    assert n % (C * W) == 0, (n, C, W)
    nb = n // (C * W)
    grid = (t_jobs, nb)

    # Mosaic wants lane-dim blocks of 128: centers are replicated to a
    # 128-wide column per job and the kernel slices lane 0.
    cx_wide = jnp.repeat(centers_x_pl, 128, axis=1)
    cy_wide = jnp.repeat(centers_y_pl, 128, axis=1)
    ox_spec = pl.BlockSpec((nl, C * W), lambda t, jb: (0, jb),
                           memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((nl, 128), lambda t, jb: (0, t),
                          memory_space=pltpu.VMEM)
    pre_spec = pl.BlockSpec((nl, C * W), lambda t, jb: (0, t * nb + jb),
                            memory_space=pltpu.VMEM)
    tot_spec = pl.BlockSpec((nl, W), lambda t, jb: (0, t * nb + jb),
                            memory_space=pltpu.VMEM)

    pre, tot = pl.pallas_call(
        functools.partial(_fwd_kernel, C=C, W=W),
        grid=grid,
        in_specs=[ox_spec, c_spec],
        out_specs=[pre_spec, tot_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nl, t_jobs * n), jnp.uint32),
            jax.ShapeDtypeStruct((nl, t_jobs * nb * W), jnp.uint32),
        ],
        interpret=interpret,
    )(ox_pl, cx_wide)

    # One Fermat for the whole epoch: planar Pallas Montgomery fold over
    # the totals (all multiplies VMEM-resident, full lane width).
    itot = batch_inv_planar(tot, chunk_c=C, lanes_w=W, interpret=interpret)

    out_spec = pl.BlockSpec((8, C * W), lambda t, jb: (0, t * nb + jb),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, C=C, W=W, htsz=htsz),
        grid=grid,
        in_specs=[ox_spec, ox_spec, c_spec, c_spec, pre_spec, tot_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((8, t_jobs * n), jnp.uint32),
        interpret=interpret,
    )(ox_pl, oy_pl, cx_wide, cy_wide, pre, itot)
    return out
