"""secp256k1 field arithmetic in PLANAR limb layout: (16, W) uint32.

The lane-major twin of ops/field.py for the Pallas hot path. A batch of W
field elements is one (16, W) uint32 array — limb index in the SUBLANE axis
(axis 0), batch in the LANE axis (axis 1). Every elementwise op then runs at
full 8x128 VPU width (the (B, 16) layout of ops/field.py leaves 112/128
lanes idle and makes XLA materialize the (B, 16, 16) schoolbook outer
product to HBM; planar keeps the whole multiply in registers/VMEM).

This is the TPU answer to the reference kernel's per-thread 8x32-bit limb
registers (decoded PTX of bsgscudaussualHTchangeble1_7_3.pb: MULMODP /
SQUAREMODP / INVMODP device funcs): one SIMT thread's register file becomes
one VPU lane.

Functions here are pure jnp on (16, W) arrays, so they trace both inside
Pallas kernels (refs loaded to values) and in plain jit (for CPU tests).
Semantics are bit-identical to ops/field.py (same 16x16-bit limb split,
same 2^256 = 2^32 + 977 fold, same carry bounds) — tests/test_planar.py
cross-checks every op against the row-major implementation.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import field as F

_U32 = jnp.uint32
NLIMBS = F.NLIMBS
LIMB_BITS = F.LIMB_BITS
LIMB_MASK = F.LIMB_MASK


def const_col(x: int) -> np.ndarray:
    """Host int -> (16, 1) uint32 planar column (broadcasts over lanes)."""
    return F.to_limbs(x).reshape(NLIMBS, 1)


P_COL = const_col(F.P_INT)


def _limb_iota():
    return jax.lax.broadcasted_iota(_U32, (NLIMBS, 1), 0)


def p_col():
    """The prime p as a (16, 1) planar column, built from iota arithmetic so
    Pallas kernels don't capture an array constant (pallas_call requires
    captured consts to be inputs; scalars/iota trace as ops instead).
    p = 2^256 - 2^32 - 977: limbs [0xFC2F, 0xFFFF, 0xFFFE, 0xFFFF x 13]."""
    i = _limb_iota()
    return jnp.where(
        i == 0, _U32(0xFC2F), jnp.where(i == 2, _U32(0xFFFE), _U32(0xFFFF))
    )


def one_col():
    """Field element 1 as an iota-built (16, 1) planar column."""
    return jnp.where(_limb_iota() == 0, _U32(1), _U32(0))


def from_rows(a):
    """(..., B, 16) row-major -> (..., 16, B) planar."""
    return jnp.swapaxes(a, -1, -2)


def to_rows(a):
    """(..., 16, B) planar -> (..., B, 16) row-major."""
    return jnp.swapaxes(a, -1, -2)


# ---------------------------------------------------------------------------
# Carry machinery (Kogge-Stone over the SUBLANE axis)


def _shift_up(x, d: int):
    """Shift limbs toward the high end by d sublanes (zero-fill low)."""
    pad = [(d, 0)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x[:-d], pad)


def _embed(x, lo: int, total: int):
    """Place rows of x at [lo, lo+len(x)) inside a zero (total, W) array.

    Pure pad (Mosaic-lowerable) — .at[lo:..].add() would become a
    scatter-add, which Pallas TPU cannot lower.
    """
    hi = total - lo - x.shape[0]
    pad = [(lo, hi)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _add_at0(t):
    """t with 1 added to limb row 0 (pad-free: row-iota one-hot)."""
    i = jax.lax.broadcasted_iota(_U32, t.shape, 0)
    return t + (i == 0).astype(_U32)


def _resolve_carries(t):
    """(16, W) uint32 with t < 2^17 per limb -> (limbs < 2^16, carry row).

    Log-depth generate/propagate combine, same as field._resolve_carries
    but along axis 0. Returns (out, carry_out (W,) in {0,1})."""
    L = t.shape[0]
    lo = t & _U32(LIMB_MASK)
    g = t >> _U32(LIMB_BITS)
    p = (lo == _U32(LIMB_MASK)).astype(_U32)
    G, P = g, p
    d = 1
    while d < L:
        G = G | (P & _shift_up(G, d))
        P = P & _shift_up(P, d)
        d *= 2
    c_in = _shift_up(G, 1)
    out = (lo + c_in) & _U32(LIMB_MASK)
    return out, G[L - 1 : L]


def _carry_norm(cols):
    """(16, W) columns < 2^27 -> (normalized limbs, carry (W,))."""
    c = cols >> _U32(LIMB_BITS)
    t = (cols & _U32(LIMB_MASK)) + _shift_up(c, 1)
    out, cout = _resolve_carries(t)
    return out, c[-1:] + cout


# ---------------------------------------------------------------------------
# Add / sub / compare


def add_raw(a, b):
    return _carry_norm(a + b)


def sub_raw(a, b):
    """a - b -> (diff mod 2^256, borrow (W,) in {0,1})."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    t = _add_at0(a + (b ^ _U32(LIMB_MASK)))
    c = t >> _U32(LIMB_BITS)
    t = (t & _U32(LIMB_MASK)) + _shift_up(c, 1)
    out, cout = _resolve_carries(t)
    return out, _U32(1) - (c[-1:] + cout)


def is_zero(a):
    """(16, W) -> (1, W) bool (2D: Mosaic has no 1D vectors)."""
    return jnp.all(a == 0, axis=0, keepdims=True)


def eq(a, b):
    return jnp.all(a == b, axis=0, keepdims=True)


def select(mask, a, b):
    """mask (1, W) bool: pick a lanes else b lanes."""
    return jnp.where(mask, a, b)


def add_mod(a, b):
    s, c = add_raw(a, b)
    t, br = sub_raw(s, p_col())
    return select((c == 1) | (br == 0), t, s)


def sub_mod(a, b):
    d, br = sub_raw(a, b)
    d2, _ = add_raw(d, p_col())
    return select(br == 1, d2, d)


def neg_mod(a):
    d, _ = sub_raw(p_col(), a)
    return select(is_zero(a), a, d)


# ---------------------------------------------------------------------------
# Multiplication
#
# Schoolbook as 16 sublane-broadcast passes: pass i multiplies the whole b
# array by limb a_i (one (16, W) vector multiply) and accumulates its lo/hi
# 16-bit halves into a (32, W) column accumulator at offsets i / i+1. Column
# bound: <= 32 terms < 2^16 -> < 2^21, exact in uint32.


def _mul_cols(a, b):
    """(16, W) x (16, W) -> (32, W) uint32 product columns (< 2^21)."""
    W = a.shape[1:]
    total = 2 * NLIMBS
    cols = jnp.zeros((total,) + W, _U32)
    for i in range(NLIMBS):
        prod = a[i : i + 1] * b  # (16, W), exact u32
        cols = cols + _embed(prod & _U32(LIMB_MASK), i, total)
        cols = cols + _embed(prod >> _U32(LIMB_BITS), i + 1, total)
    return cols


def _fold_once(cols):
    """Fold columns >= 16 via 2^256 = 2^32 + 977 (cols (L, W), 16 < L <= 18,
    columns < 2^22). Returns (16, W) columns < 2^23, value preserved mod p."""
    L = cols.shape[0]
    lo = cols[:16]
    hi = cols[16:]
    nh = L - 16
    h977 = hi * _U32(F.FOLD_977)
    out = lo + _embed(h977 & _U32(LIMB_MASK), 0, 16)
    out = out + _embed(h977 >> _U32(LIMB_BITS), 1, 16)
    out = out + _embed(hi, 2, 16)
    return out


def _reduce_to_p(x, top):
    d, br = sub_raw(x, p_col())
    return select((top == 1) | (br == 0), d, x)


def reduce_512(cols):
    """(32, W) columns < 2^21 -> canonical (16, W) mod p. Mirrors
    field.reduce_512 along axis 0 (same bounds, same fold chain)."""
    lo = cols[:16]
    hi = cols[16:]
    h977 = hi * _U32(F.FOLD_977)
    t = _embed(lo + (h977 & _U32(LIMB_MASK)), 0, 18)
    t = t + _embed(h977 >> _U32(LIMB_BITS), 1, 18)
    t = t + _embed(hi, 2, 18)
    f2 = _fold_once(t)
    norm, c = _carry_norm(f2)
    c977 = c * _U32(F.FOLD_977)
    tail = jnp.concatenate(
        [c977 & _U32(LIMB_MASK), c977 >> _U32(LIMB_BITS), c], axis=0
    )
    norm = norm + _embed(tail, 0, 16)
    norm, c2 = _carry_norm(norm)
    return _reduce_to_p(norm, c2)


def mul_mod(a, b):
    return reduce_512(_mul_cols(a, b))


def _sqr_cols(a):
    """(16, W) squared -> (32, W) uint32 product columns.

    Triangle form of the schoolbook (the planar analog of the reference's
    dedicated m_squareModX64, lib/Curve64.pb:2161): off-diagonal pairs are
    multiplied once and doubled, the diagonal lands via a sublane
    interleave — 136 row-multiplies instead of _mul_cols' 256.

    Column bound: off-diagonal <= 16 lo/hi terms < 2^16 per column, doubled
    -> < 2^21; diagonal adds <= 2 more terms -> total < 2^21 + 2^17, within
    reduce_512's headroom (its first fold multiplies hi columns by 977 in
    uint32: (2^21 + 2^17) * 977 < 2^32).
    """
    W = a.shape[1:]
    total = 2 * NLIMBS
    off = jnp.zeros((total,) + W, _U32)
    for i in range(NLIMBS - 1):
        prod = a[i : i + 1] * a[i + 1 :]  # rows j=i+1..15 -> cols 2i+1+k
        off = off + _embed(prod & _U32(LIMB_MASK), 2 * i + 1, total)
        off = off + _embed(prod >> _U32(LIMB_BITS), 2 * i + 2, total)
    d = a * a
    diag = jnp.stack(
        [d & _U32(LIMB_MASK), d >> _U32(LIMB_BITS)], axis=1
    ).reshape((total,) + W)
    return off + off + diag


def sqr_mod(a):
    return reduce_512(_sqr_cols(a))


# ---------------------------------------------------------------------------
# Inversion (Fermat, addition chain — planar twin of field.inv_mod_chain)


def _sqr_n(x, n: int, roll: bool = True):
    if not roll or n <= 2:
        for _ in range(n):
            x = sqr_mod(x)
        return x
    return jax.lax.fori_loop(0, n, lambda _, v: sqr_mod(v), x)


def inv_mod_chain(a, unroll: bool = False):
    """a^(p-2): 255 squarings + 15 multiplies. unroll=True flattens the
    fori_loops (inside Pallas kernels rolled loops are fine; unroll exists
    for graph-shape experiments)."""
    roll = not unroll
    x1 = a
    x2 = mul_mod(_sqr_n(x1, 1, roll), x1)
    x4 = mul_mod(_sqr_n(x2, 2, roll), x2)
    x8 = mul_mod(_sqr_n(x4, 4, roll), x4)
    x16 = mul_mod(_sqr_n(x8, 8, roll), x8)
    x32 = mul_mod(_sqr_n(x16, 16, roll), x16)
    x64 = mul_mod(_sqr_n(x32, 32, roll), x32)
    x128 = mul_mod(_sqr_n(x64, 64, roll), x64)
    t = mul_mod(_sqr_n(x128, 64, roll), x64)
    t = mul_mod(_sqr_n(t, 16, roll), x16)
    t = mul_mod(_sqr_n(t, 8, roll), x8)
    t = mul_mod(_sqr_n(t, 4, roll), x4)
    t = mul_mod(_sqr_n(t, 2, roll), x2)
    t = mul_mod(_sqr_n(t, 1, roll), x1)
    tail = 0xFFFFFC2D
    if unroll:
        for b in bin(tail)[2:].zfill(33):
            t = sqr_mod(t)
            if b == "1":
                t = mul_mod(t, x1)
        return t

    # Bit 32 of the 33-bit tail is always 0: square once up front, then walk
    # the remaining 32 bits with shift amounts in [0, 31] (a shift of 32 on
    # uint32 is undefined and lowering-dependent inside Mosaic kernels).
    t = sqr_mod(t)

    def body(i, v):
        v = sqr_mod(v)
        # bit (31 - i), MSB-first, via scalar shift of the constant —
        # no (32,) array constant, so this traces inside Pallas kernels
        bit = (jnp.uint32(tail) >> (jnp.uint32(31) - i.astype(jnp.uint32))) & jnp.uint32(1)
        return select(
            jnp.broadcast_to(bit == 1, (1, v.shape[1])), mul_mod(v, x1), v
        )

    return jax.lax.fori_loop(0, 32, body, t)


# ---------------------------------------------------------------------------
# Prefix extraction (probe keys)


def x_prefix64(x):
    """(16, W) -> (hi32, lo32) each (1, W) uint32 — low 64 bits of x."""
    lo = x[0:1] | (x[1:2] << _U32(LIMB_BITS))
    hi = x[2:3] | (x[3:4] << _U32(LIMB_BITS))
    return hi, lo


def bucket_disc(hi, lo, htsz: int):
    """Same split as models/table.bucket_disc, planar callers."""
    bucket = hi >> _U32(32 - htsz)
    disc = (hi << _U32(htsz)) | (lo >> _U32(32 - htsz))
    return bucket, disc
