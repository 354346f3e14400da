"""secp256k1 elliptic-curve ops on limb planes, TPU-native.

Role-equivalent of the reference's affine EC layer and Montgomery-trick
batch addition (lib/Curve64.pb:2524-3065), re-designed for JAX:

- Points are pairs of field elements ``(x, y)`` with shape ``(..., 16)``
  uint32 limbs (see ops/field.py); infinity is tracked by explicit boolean
  flags where the API needs it (the hot path is constructed to avoid it).
- ``batch_inv`` amortizes ONE Fermat inversion over an arbitrarily large
  batch via the Montgomery trick, structured as two lax.scans over chunk
  rows so the sequential depth is ~2*chunk while the vector width keeps the
  VPU saturated (the reference's beginBatchAdd/completeBatchAddWithDouble
  serial chain, lib/Curve64.pb:2914-3031, re-shaped for SIMD lanes).
- ``fill_multiples`` generates [base + i*step] arrays with the doubling-fill
  pattern (reference fillarrayN, lib/Curve64.pb:3033-3065): host-side exact
  ints supply the per-pass common points, the device does the batched adds.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import field as F
from ..utils import ecpy

_U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Batch inversion (Montgomery trick)


@partial(jax.jit, static_argnames=('chunk', 'chain'))
def batch_inv(a, chunk: int = 256, chain: bool = False):
    """Elementwise modular inverse of a (B, 16) batch, one Fermat inversion
    per ~B/chunk group plus 3 multiplies per element.

    All elements must be nonzero (callers mask zeros to 1 and flag them,
    exactly like the solver's exact-landing detection). Recurses on the
    group totals, so the Fermat cost is amortized twice over for large B.
    """
    B = a.shape[0]
    if B <= chunk:
        # chain=True uses the addition-chain Fermat (~273 vs ~511 dependent
        # multiplies): wins on the latency-critical giant-step path, but
        # its graph compiles ~25x slower, so cold paths keep the rolled
        # ladder.
        return F.inv_mod_chain(a) if chain else F.inv_mod(a)
    C = chunk
    pad = (-B) % C
    if pad:
        a = jnp.concatenate([a, F.broadcast_const(1, (pad,))], axis=0)
    W = a.shape[0] // C
    ar = a.reshape(W, C, F.NLIMBS).transpose(1, 0, 2)  # (C, W, 16)
    ones = F.broadcast_const(1, (W,))

    def fwd(carry, x):
        y = F.mul_mod(carry, x)
        return y, y

    tot, prefixes = jax.lax.scan(fwd, ones, ar)
    inv_tot = batch_inv(tot, chunk, chain)  # (W, 16)

    pref_prev = jnp.concatenate([ones[None], prefixes[:-1]], axis=0)

    def bwd(carry, xs):
        x, pp = xs
        inv_x = F.mul_mod(carry, pp)
        return F.mul_mod(carry, x), inv_x

    _, invs = jax.lax.scan(bwd, inv_tot, (ar, pref_prev), reverse=True)
    out = invs.transpose(1, 0, 2).reshape(-1, F.NLIMBS)
    return out[:B] if pad else out


# ---------------------------------------------------------------------------
# Affine point arithmetic (general, with edge cases — non-hot paths)


@jax.jit
def point_dbl(x, y):
    """Affine doubling; assumes y != 0 (callers handle order-2 separately —
    secp256k1 has none on the curve)."""
    three_x2 = F.mul_small_mod(F.sqr_mod(x), 3)
    inv_2y = F.inv_mod(F.add_mod(y, y))
    lam = F.mul_mod(three_x2, inv_2y)
    x3 = F.sub_mod(F.sub_mod(F.sqr_mod(lam), x), x)
    y3 = F.sub_mod(F.mul_mod(lam, F.sub_mod(x, x3)), y)
    return x3, y3


@jax.jit
def point_add_full(x1, y1, inf1, x2, y2, inf2):
    """Fully general affine addition with infinity flags (batched).

    Costs one Fermat inversion; used by scalar_mul and verification paths,
    never by the giant-step hot loop.
    """
    same_x = F.eq(x1, x2)
    y_cancel = F.is_zero(F.add_mod(y1, y2))
    use_dbl = same_x & ~y_cancel
    den = F._select(use_dbl, F.add_mod(y1, y1), F.sub_mod(x2, x1))
    num = F._select(
        use_dbl, F.mul_small_mod(F.sqr_mod(x1), 3), F.sub_mod(y2, y1)
    )
    # Avoid inverting 0 in degenerate lanes (result discarded there).
    deg = F.is_zero(den)
    den = F._select(deg, F.broadcast_const(1, den.shape[:-1]), den)
    lam = F.mul_mod(num, F.inv_mod(den))
    x3 = F.sub_mod(F.sub_mod(F.sqr_mod(lam), x1), x2)
    y3 = F.sub_mod(F.mul_mod(lam, F.sub_mod(x1, x3)), y1)
    inf3 = same_x & y_cancel & ~inf1 & ~inf2
    # Select precedence: P1 at infinity -> P2; P2 at infinity -> P1; else sum.
    ox = F._select(inf1, x2, F._select(inf2, x1, x3))
    oy = F._select(inf1, y2, F._select(inf2, y1, y3))
    oinf = jnp.where(inf1, inf2, jnp.where(inf2, inf1, inf3))
    return ox, oy, oinf


@jax.jit
def scalar_mul(k_limbs, px, py):
    """k * P by double-and-add over 256 bits (batched; k as 16x16-bit limbs).

    Verification-path only (the solver precomputes all scalar multiples via
    fill_multiples); equivalent of the reference m_PTMULX64
    (lib/Curve64.pb:2586-2620).
    """
    batch = k_limbs.shape[:-1]
    zero = F.broadcast_const(0, batch)
    acc = (zero, zero, jnp.ones(batch, bool))
    addend = (px, py, jnp.zeros(batch, bool))

    def body(i, state):
        (ax, ay, ainf), (dx, dy, dinf) = state
        limb = jax.lax.dynamic_index_in_dim(
            k_limbs, i // F.LIMB_BITS, axis=-1, keepdims=False
        )
        bit = (limb >> (i % F.LIMB_BITS).astype(_U32)) & _U32(1)
        sx, sy, sinf = point_add_full(ax, ay, ainf, dx, dy, dinf)
        take = bit == 1
        nacc = (
            F._select(take, sx, ax),
            F._select(take, sy, ay),
            jnp.where(take, sinf, ainf),
        )
        ndx, ndy, ndinf = point_add_full(dx, dy, dinf, dx, dy, dinf)
        return nacc, (ndx, ndy, ndinf)

    (ax, ay, ainf), _ = jax.lax.fori_loop(
        0, 256, lambda i, s: body(_U32(i), s), (acc, addend)
    )
    return ax, ay, ainf


# ---------------------------------------------------------------------------
# Batched add of a common point (the workhorse)


@partial(jax.jit, static_argnames=('chunk',))
def add_common(px, py, cx, cy, dblx=None, dbly=None, chunk: int = 256):
    """(px, py) + (cx, cy) for a batch of points plus one broadcast common
    point, sharing a single Montgomery-trick inversion.

    Degenerate lanes where px == cx:
      - py == cy  (P == C): result is 2C, which callers pass in precomputed
        as (dblx, dbly) — this is the role of the reference's
        completeBatchAddWithDouble (lib/Curve64.pb:2946-3031).
      - py == -cy (P == -C): the sum is infinity; flagged in the returned
        ``inf`` mask (lane output is garbage there).

    Returns (x3, y3, inf_mask).
    """
    cxb = jnp.broadcast_to(cx, px.shape)
    cyb = jnp.broadcast_to(cy, py.shape)
    d = F.sub_mod(px, cxb)
    deg = F.is_zero(d)
    d_safe = F._select(deg, F.broadcast_const(1, d.shape[:-1]), d)
    inv_d = batch_inv(d_safe, chunk=chunk)
    lam = F.mul_mod(F.sub_mod(py, cyb), inv_d)
    x3 = F.sub_mod(F.sub_mod(F.sqr_mod(lam), px), cxb)
    y3 = F.sub_mod(F.mul_mod(lam, F.sub_mod(cxb, x3)), cyb)
    same_y = F.eq(py, cyb)
    is_dbl = deg & same_y
    inf = deg & ~same_y
    if dblx is not None:
        x3 = F._select(is_dbl, jnp.broadcast_to(dblx, x3.shape), x3)
        y3 = F._select(is_dbl, jnp.broadcast_to(dbly, y3.shape), y3)
    else:
        inf = deg  # without a doubling fallback, flag all degenerates
    return x3, y3, inf


# ---------------------------------------------------------------------------
# Multiples generation (doubling fill)


def _as_limb_point(pt):
    x, y = pt
    return jnp.asarray(F.to_limbs(x)), jnp.asarray(F.to_limbs(y))


@partial(jax.jit, static_argnames=("n",))
def _fill_tile(bx0, by0, inf0, commons, dbls, n: int):
    """Extend a seed row [P .. P+(m-1)D] to [P .. P+(n-1)D] by log2(n/m)
    doubling passes (pass k adds (m*2^k)*D to the first m*2^k lanes).

    commons[k] / dbls[k]: limb points for (m*2^k)*D and its double
    (host-computed exactly). m = seed length and n must be powers of two.
    Returns (x, y, inf_mask): a lane is flagged when its true value is the
    point at infinity (its coordinates are then garbage and must not be
    trusted) — the solver turns such lanes into exact-hit candidates.
    """
    m = bx0.shape[0]
    if m == n:
        return bx0, by0, inf0
    pad = [(0, n - m)]
    bx = jnp.pad(bx0, pad + [(0, 0)])
    by = jnp.pad(by0, pad + [(0, 0)])
    binf = jnp.pad(inf0, pad)
    have = m
    k = 0
    while have < n:
        cx, cy = commons[k]
        dx, dy = dbls[k]
        nx, ny, inf = add_common(bx[:have], by[:have], cx, cy, dx, dy)
        # a lane already at infinity stays wrong after any further add; keep
        # it flagged (inf + C != inf, but we only need the flag for hits)
        inf = inf | binf[:have]
        bx = jax.lax.dynamic_update_slice(bx, nx, (have, 0))
        by = jax.lax.dynamic_update_slice(by, ny, (have, 0))
        binf = jax.lax.dynamic_update_slice(binf, inf, (have,))
        have *= 2
        k += 1
    return bx, by, binf


def host_row(base_pt, step_pt, m: int):
    """[base + i*step for i in range(m)] computed exactly on the host.

    Returns (x (m,16), y (m,16), inf (m,) numpy arrays). Used to seed
    device fills: m stays small (tens), so the cost is negligible while it
    removes log2(m) compile-heavy doubling passes from the device graph.
    """
    xs = np.zeros((m, F.NLIMBS), np.uint32)
    ys = np.zeros((m, F.NLIMBS), np.uint32)
    inf = np.zeros((m,), bool)
    p = base_pt
    for i in range(m):
        if p is None:
            inf[i] = True
        else:
            xs[i] = F.to_limbs(p[0])
            ys[i] = F.to_limbs(p[1])
        p = ecpy.add(p, step_pt)
    return xs, ys, inf


def fill_multiples(base_pt, step_pt, n: int, with_inf: bool = False,
                   seed: int = 64):
    """Device arrays (n, 16) x/y for [base + i*step, i in 0..n-1].

    base_pt / step_pt are host-int affine points (ecpy tuples). n is rounded
    up to a power of two internally; callers slice. The first min(seed, n)
    elements are computed exactly on the host (cheap); the device then runs
    log2(n/seed) batched doubling passes, ~n adds total.
    With with_inf=True also returns the infinity-lane mask (see _fill_tile).
    """
    n_pow = 1 << max(0, (n - 1).bit_length())
    m = min(1 << max(0, (min(seed, n_pow) - 1).bit_length()), n_pow)
    sx, sy, sinf = host_row(base_pt, step_pt, m)
    commons, dbls = [], []
    k = 0
    while m << k < n_pow:
        c = ecpy.mul(m << k, step_pt)
        commons.append(_as_limb_point(c))
        dbls.append(_as_limb_point(ecpy.dbl(c)))
        k += 1
    bx, by, binf = _fill_tile(
        jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(sinf),
        tuple(commons), tuple(dbls), n_pow,
    )
    if with_inf:
        return bx[:n], by[:n], binf[:n]
    return bx[:n], by[:n]


@jax.jit
def extend_tile(bx, by, cx, cy, dx, dy):
    """Advance a whole tile by a constant point: tile + C (batched).

    Used to stream large baby/giant tables tile by tile: each call is one
    batched add pass (the reference's per-thread template advance,
    1_9_7File.pb:1162-1235, re-shaped to one giant SIMD pass).
    """
    return add_common(bx, by, cx, cy, dx, dy)
