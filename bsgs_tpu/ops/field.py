"""secp256k1 field arithmetic on 16x16-bit limb planes (uint32), TPU-native.

Role-equivalent of the reference's CPU bignum core (lib/Curve64.pb:62-2523)
and the PTX device funcs ADD/SUB/MULMODP/SQUAREMODP/INVMODP
(bsgscudaussualHTchangeble1_7_3.pb decoded PTX), but designed for the TPU
VPU rather than translated:

- A 256-bit field element is ``(..., 16) uint32``, little-endian limbs, each
  limb in ``[0, 2^16)``. The batch lives in the leading dims and vectorizes
  across TPU lanes; the limb axis is tiny and unrolled at trace time.
- 16-bit limbs (not 32/64) because the TPU has no 64-bit scalar ISA and no
  mulhi: a 16x16 product fits exactly in uint32, and every column sum in the
  schoolbook multiply stays < 2^21, so the entire multiplier is exact in
  plain uint32 vector ops — no carries lost, no wide types, Pallas-friendly.
- Reduction uses the secp256k1 fold 2^256 ≡ 2^32 + 977 (mod p), the same
  identity as the reference's x0x1000003D1 fold (lib/Curve64.pb:1038-1439),
  re-derived for the 16-bit radix.
- Inversion is Fermat (a^(p-2)) with a compile-time-unrolled ladder: the
  solver only ever inverts once per batch (Montgomery trick, see ops/ec.py),
  so branch-free beats the reference's binary extended Euclid
  (lib/Curve64.pb:2457-2523) on this hardware.

All functions are shape-polymorphic over leading batch dims and jit-safe.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Representation

NLIMBS = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1

# secp256k1 prime and curve constants (host ints)
P_INT = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
N_INT = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
GX_INT = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY_INT = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8
B_INT = 7
# 2^256 mod p = 2^32 + 977
FOLD_INT = (1 << 32) + 977
FOLD_977 = 977

_U32 = jnp.uint32


def to_limbs(x: int, nlimbs: int = NLIMBS) -> np.ndarray:
    """Host int -> (nlimbs,) uint32 little-endian 16-bit limbs."""
    assert 0 <= x < (1 << (LIMB_BITS * nlimbs))
    return np.array(
        [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(nlimbs)], dtype=np.uint32
    )


def from_limbs(a) -> int:
    """(..., L) limbs -> host int (single element only)."""
    a = np.asarray(a)
    assert a.ndim == 1, "from_limbs takes a single element; use from_limbs_batch"
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(a))


def from_limbs_batch(a) -> np.ndarray:
    """(..., L) limbs -> (...,) object array of host ints."""
    a = np.asarray(a)
    out = np.zeros(a.shape[:-1], dtype=object)
    for i in range(a.shape[-1]):
        out = out + (a[..., i].astype(object) << (LIMB_BITS * i))
    return out


def to_limbs_batch(xs, nlimbs: int = NLIMBS) -> np.ndarray:
    """Iterable of host ints -> (len, nlimbs) uint32."""
    return np.stack([to_limbs(int(x), nlimbs) for x in xs])


def broadcast_const(x: int, batch_shape=()) -> jnp.ndarray:
    """Host int -> limbs broadcast to batch_shape + (NLIMBS,)."""
    c = jnp.asarray(to_limbs(x))
    return jnp.broadcast_to(c, tuple(batch_shape) + (NLIMBS,))


P_LIMBS = to_limbs(P_INT)
N_LIMBS_ARR = to_limbs(N_INT)

# ---------------------------------------------------------------------------
# Carry machinery
#
# Carry/borrow propagation is LOG-DEPTH Kogge-Stone over the limb axis:
# ~25 elementwise ops on the whole (..., L) array, all fusable by XLA into
# the surrounding multiply chain. (A lax.scan over limbs — the obvious
# translation of the reference's sequential adc chains,
# lib/Curve64.pb:840-1037 — compiles to an XLA While loop that breaks
# fusion and round-trips HBM once per limb step; on TPU that made carry
# propagation the bottleneck of the entire solver.)


def _shift_up(x, d: int):
    """Shift limbs toward the high end by d positions (zero-fill low)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(d, 0)]
    return jnp.pad(x[..., :-d], pad)


def _resolve_carries(t):
    """Exact carry resolution of (..., L) uint32 with t < 2^17 per limb.

    Returns (limbs < 2^16, carry_out in {0,1}) via generate/propagate
    Kogge-Stone: G_i = carry out of limbs 0..i, combined in log2(L) rounds.
    """
    L = t.shape[-1]
    lo = t & _U32(LIMB_MASK)
    g = t >> _U32(LIMB_BITS)  # in {0,1}
    p = (lo == _U32(LIMB_MASK)).astype(_U32)
    G, P = g, p
    d = 1
    while d < L:
        G = G | (P & _shift_up(G, d))
        P = P & _shift_up(P, d)
        d *= 2
    c_in = _shift_up(G, 1)
    out = (lo + c_in) & _U32(LIMB_MASK)
    return out, G[..., -1]


def _carry_norm_arr(cols):
    """(..., L) uint32 columns -> (normalized 16-bit limbs, carry).

    Precondition: columns < 2^27 (so the staged carries stay < 2^11 and
    the Kogge-Stone input stays < 2^17).
    """
    c = cols >> _U32(LIMB_BITS)
    t = cols & _U32(LIMB_MASK)
    t = t.at[..., 1:].add(c[..., :-1])  # t < 2^16 + 2^11
    out, cout = _resolve_carries(t)
    return out, c[..., -1] + cout


def _stack_cols(cols):
    return jnp.stack(cols, axis=-1)


# ---------------------------------------------------------------------------
# Add / sub / compare (raw 256-bit)


@jax.jit
def add_raw(a, b):
    """256-bit a + b -> (sum mod 2^256, carry in {0,1})."""
    return _carry_norm_arr(a + b)


@jax.jit
def sub_raw(a, b):
    """256-bit a - b -> (diff mod 2^256, borrow in {0,1}).

    Computed as a + ~b + 1 with Kogge-Stone carries; borrow = 1 - carry.
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    t = a + (b ^ _U32(LIMB_MASK))  # < 2^17
    t = t.at[..., 0].add(_U32(1))
    # t < 2^17 + 1; one pre-stage keeps the KS input in range
    c = t >> _U32(LIMB_BITS)
    t = t & _U32(LIMB_MASK)
    t = t.at[..., 1:].add(c[..., :-1])
    out, cout = _resolve_carries(t)
    # carry out of limb L-1 from the pre-stage is c[-1]; total in {0,1,2}
    # but for a+~b+1 < 2^257 it is in {0,1}
    carry = c[..., -1] + cout
    return out, _U32(1) - carry


@jax.jit
def geq(a, b):
    """a >= b, elementwise over the batch."""
    _, borrow = sub_raw(a, b)
    return borrow == 0


@jax.jit
def eq(a, b):
    return jnp.all(a == b, axis=-1)


@jax.jit
def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def _select(mask, a, b):
    """Where mask (batch bool) pick a else b; mask broadcast over limb axis."""
    return jnp.where(mask[..., None], a, b)


# ---------------------------------------------------------------------------
# Modular add / sub / neg


@jax.jit
def add_mod(a, b):
    """(a + b) mod p for a, b < p."""
    s, c = add_raw(a, b)
    t, br = sub_raw(s, jnp.asarray(P_LIMBS))
    # Use t when the true sum >= p: either a carry out of 2^256 (the wrapped
    # subtraction then lands exactly on s + 2^256 - p) or s >= p directly.
    return _select((c == 1) | (br == 0), t, s)


@jax.jit
def sub_mod(a, b):
    """(a - b) mod p for a, b < p."""
    d, br = sub_raw(a, b)
    d2, _ = add_raw(d, jnp.asarray(P_LIMBS))
    return _select(br == 1, d2, d)


@jax.jit
def neg_mod(a):
    """(-a) mod p for a < p."""
    d, _ = sub_raw(jnp.asarray(P_LIMBS), a)
    return _select(is_zero(a), a, d)


# ---------------------------------------------------------------------------
# Multiplication
#
# All multiplier stages are whole-array ops over the limb axis (outer
# product, slice-adds, scan carries) rather than per-column scalar graphs:
# the traced graph per mul_mod is ~100 nodes, which keeps compile times of
# kernels that inline hundreds of multiplies tractable, and gives XLA big
# fusable elementwise ops.


def _mul_wide(a, b):
    """Schoolbook 256x256 -> 512-bit product as (..., 32) uint32 columns.

    Each 16x16-bit partial product splits into lo/hi 16-bit halves, so a
    column accumulates at most 32 values < 2^16: columns < 2^21, no uint32
    overflow anywhere.
    """
    prod = a[..., :, None] * b[..., None, :]  # (..., 16, 16) exact in u32
    lo = prod & _U32(LIMB_MASK)
    hi = prod >> _U32(LIMB_BITS)
    batch = prod.shape[:-2]
    cols = jnp.zeros(batch + (2 * NLIMBS,), _U32)
    for i in range(NLIMBS):
        cols = cols.at[..., i : i + NLIMBS].add(lo[..., i, :])
        cols = cols.at[..., i + 1 : i + 1 + NLIMBS].add(hi[..., i, :])
    return cols


def _fold_cols(cols):
    """Fold columns >= 16 back via 2^256 ≡ 2^32 + 977 (mod p).

    cols: (..., L) uint32 with 16 < L <= 18, columns < 2^22 (so the x977
    products stay < 2^32). Returns (..., 16) columns < 2^23 — value
    preserved mod p, NOT carry-normalized.
    """
    L = cols.shape[-1]
    assert 16 < L <= 18, L
    lo = cols[..., :16]
    hi = cols[..., 16:]
    nh = L - 16
    h977 = hi * _U32(FOLD_977)
    out = lo
    # hi * 977 at positions 0..nh and its 16-bit split
    out = out.at[..., :nh].add(h977 & _U32(LIMB_MASK))
    out = out.at[..., 1 : 1 + nh].add(h977 >> _U32(LIMB_BITS))
    # hi << 32 == shift by 2 limb positions
    out = out.at[..., 2 : 2 + nh].add(hi)
    return out


def _reduce_to_p(x, top):
    """Value top*2^256 + x (top in {0,1}, value < 2p) -> canonical < p."""
    d, br = sub_raw(x, jnp.asarray(P_LIMBS))
    return _select((top == 1) | (br == 0), d, x)


def reduce_512(cols):
    """(..., 32) uint32 columns (each < 2^21, a 512-bit value) -> mod p.

    Same fold identity as the reference's x0x1000003D1 chain
    (lib/Curve64.pb:1038-1439): two unnormalized folds 512->288->256 bits,
    one carry normalization, a third tiny fold of the remaining top bits,
    and one conditional subtract.
    """
    # fold 32 -> 18 columns: process high half in two 16->(<=18) passes.
    # First fold columns 16..31 (< 2^21) into 0..17: do it in one shot by
    # treating cols as lo(16) + hi(16); hi*977 < 2^31 fits u32.
    lo = cols[..., :16]
    hi = cols[..., 16:]
    h977 = hi * _U32(FOLD_977)
    t = jnp.zeros(cols.shape[:-1] + (18,), _U32)
    t = t.at[..., :16].add(lo)
    t = t.at[..., :16].add(h977 & _U32(LIMB_MASK))
    t = t.at[..., 1:17].add(h977 >> _U32(LIMB_BITS))
    t = t.at[..., 2:18].add(hi)
    # t columns < 2^21 + 2^16 + 2^16 + 2^21 < 2^22.1; value < ~2^290
    f2 = _fold_cols(t)  # (..., 16) columns < 2^23
    norm, c = _carry_norm_arr(f2)  # c < 2^23 >> 16 accumulated ~ < 2^9
    # fold the small carry c (bits 256+): c*(2^32 + 977)
    c977 = c * _U32(FOLD_977)  # < 2^19
    norm = norm.at[..., 0].add(c977 & _U32(LIMB_MASK))
    norm = norm.at[..., 1].add(c977 >> _U32(LIMB_BITS))
    norm = norm.at[..., 2].add(c)
    norm, c2 = _carry_norm_arr(norm)  # value < 2^256 + 2^51 < 2p
    return _reduce_to_p(norm, c2)


@jax.jit
def mul_mod(a, b):
    """(a * b) mod p, batch-vectorized. a, b < p."""
    return reduce_512(_mul_wide(a, b))


@jax.jit
def sqr_mod(a):
    """a^2 mod p. (Squaring-specific savings are a later Pallas optimization;
    semantics match mul_mod(a, a).)"""
    return mul_mod(a, a)


@partial(jax.jit, static_argnames=('k',))
def mul_small_mod(a, k: int):
    """(a * k) mod p for a host-int 0 <= k < 2^16."""
    assert 0 <= k < (1 << LIMB_BITS)
    prod = a * _U32(k)  # (..., 16) < 2^32
    cols = jnp.zeros(a.shape[:-1] + (17,), _U32)
    cols = cols.at[..., :16].add(prod & _U32(LIMB_MASK))
    cols = cols.at[..., 1:17].add(prod >> _U32(LIMB_BITS))
    f = _fold_cols(cols)  # (..., 16) < 2^18
    norm, c = _carry_norm_arr(f)  # c tiny
    c977 = c * _U32(FOLD_977)
    norm = norm.at[..., 0].add(c977 & _U32(LIMB_MASK))
    norm = norm.at[..., 1].add(c977 >> _U32(LIMB_BITS))
    norm = norm.at[..., 2].add(c)
    norm, c2 = _carry_norm_arr(norm)
    return _reduce_to_p(norm, c2)


# ---------------------------------------------------------------------------
# Exponentiation / inversion / sqrt


@partial(jax.jit, static_argnames=('e',))
def pow_mod_bits(a, e: int):
    """a^e mod p. Exponent is a host int; evaluated MSB-first with a
    fori_loop over a constant bit array, so the traced graph is one
    square + one multiply regardless of exponent size."""
    assert e > 0
    import jax

    bits = np.array([int(b) for b in bin(e)[2:]], dtype=np.uint32)
    if bits.shape[0] == 1:
        return a
    bits_j = jnp.asarray(bits)

    def body(i, acc):
        acc = sqr_mod(acc)
        return jnp.where(bits_j[i] == 1, mul_mod(acc, a), acc)

    return jax.lax.fori_loop(1, bits.shape[0], body, a)


@jax.jit
def inv_mod(a):
    """a^(p-2) mod p — branch-free Fermat inversion. inv(0) == 0.

    Generic rolled square-and-multiply ladder: the traced graph is ONE
    square + ONE multiply inside a fori_loop — smallest possible graph for
    cold-path callers. Hot kernels use inv_mod_chain below. Replaces the
    reference's binary extended Euclid (lib/Curve64.pb:2457-2523) — on TPU
    a branch-free fixed ladder beats data-dependent loops.
    """
    return pow_mod_bits(a, P_INT - 2)


def _sqr_n(x, n: int):
    """n repeated squarings with a rolled loop (1-sqr graph)."""
    if n <= 2:
        for _ in range(n):
            x = sqr_mod(x)
        return x
    return jax.lax.fori_loop(0, n, lambda _, v: sqr_mod(v), x)


@jax.jit
def inv_mod_chain(a):
    """Fermat inversion via an addition chain: 255 squarings + 15
    multiplies (p-2 = (2^223-1)*2^33 + 0xFFFFFC2D), ~273 sequential
    multiplies instead of pow_mod_bits' ~511.

    The batch-inversion Fermat sits on the critical path of every
    giant-step job (it inverts the chunk totals, ops/ec.batch_inv), and at
    TPU batch widths that path is LATENCY-bound — sequential dependent
    multiplies — so halving the chain length matters. Graph is ~30 mulmod
    subgraphs; only hot kernels should inline it.
    """
    x1 = a
    x2 = mul_mod(_sqr_n(x1, 1), x1)      # a^(2^2 - 1)
    x4 = mul_mod(_sqr_n(x2, 2), x2)      # a^(2^4 - 1)
    x8 = mul_mod(_sqr_n(x4, 4), x4)      # a^(2^8 - 1)
    x16 = mul_mod(_sqr_n(x8, 8), x8)     # a^(2^16 - 1)
    x32 = mul_mod(_sqr_n(x16, 16), x16)  # a^(2^32 - 1)
    x64 = mul_mod(_sqr_n(x32, 32), x32)  # a^(2^64 - 1)
    x128 = mul_mod(_sqr_n(x64, 64), x64)  # a^(2^128 - 1)
    # 223 = 128 + 64 + 16 + 8 + 4 + 2 + 1
    t = mul_mod(_sqr_n(x128, 64), x64)   # 2^192 - 1
    t = mul_mod(_sqr_n(t, 16), x16)      # 2^208 - 1
    t = mul_mod(_sqr_n(t, 8), x8)        # 2^216 - 1
    t = mul_mod(_sqr_n(t, 4), x4)        # 2^220 - 1
    t = mul_mod(_sqr_n(t, 2), x2)        # 2^222 - 1
    t = mul_mod(_sqr_n(t, 1), x1)        # 2^223 - 1
    # tail: e = (2^223 - 1) * 2^33 + 0xFFFFFC2D, walked MSB-first over the
    # 33 bits of the tail (square always, multiply where the bit is set).
    # Rolled as a fori_loop over a constant bit array: the traced graph is
    # ONE square + ONE select-multiply (an unrolled tail alone costs ~25 s
    # of XLA compile; runtime is identical — same 33 sequential rounds).
    tail_bits = jnp.asarray(
        np.array([int(b) for b in bin(0xFFFFFC2D)[2:].zfill(33)], np.uint32)
    )

    def tail_body(i, v):
        v = sqr_mod(v)
        return jnp.where(tail_bits[i] == 1, mul_mod(v, x1), v)

    return jax.lax.fori_loop(0, 33, tail_body, t)


@jax.jit
def sqrt_mod(a):
    """a^((p+1)/4) mod p; a square root when a is a quadratic residue.

    Mirrors the reference's YfromX lift (lib/Curve64.pb:2656-2683, DoPowMod
    at :2630) which uses the same p ≡ 3 (mod 4) exponent.
    """
    return pow_mod_bits(a, (P_INT + 1) // 4)


# ---------------------------------------------------------------------------
# Bit/shift utilities (parity with the reference's compare/bit-op surface,
# lib/Curve64.pb:475-839: shl/shr/testbit/even/and/or)


@partial(jax.jit, static_argnames=("n",))
def shr_bits(a, n: int):
    """Logical right shift of a 256-bit value by 0 <= n < 256."""
    limb_sh, bit_sh = divmod(n, LIMB_BITS)
    x = a
    if limb_sh:
        x = jnp.concatenate(
            [x[..., limb_sh:], jnp.zeros(x.shape[:-1] + (limb_sh,), _U32)],
            axis=-1,
        )
    if bit_sh:
        hi_in = jnp.concatenate(
            [x[..., 1:], jnp.zeros(x.shape[:-1] + (1,), _U32)], axis=-1
        )
        x = ((x >> _U32(bit_sh)) | (hi_in << _U32(LIMB_BITS - bit_sh))) & _U32(
            LIMB_MASK
        )
    return x


@partial(jax.jit, static_argnames=("n",))
def shl_bits(a, n: int):
    """Left shift by 0 <= n < 256 (mod 2^256)."""
    limb_sh, bit_sh = divmod(n, LIMB_BITS)
    x = a
    if limb_sh:
        x = jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (limb_sh,), _U32), x[..., :-limb_sh]],
            axis=-1,
        )
    if bit_sh:
        lo_in = jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (1,), _U32), x[..., :-1]], axis=-1
        )
        x = ((x << _U32(bit_sh)) | (lo_in >> _U32(LIMB_BITS - bit_sh))) & _U32(
            LIMB_MASK
        )
    return x


@partial(jax.jit, static_argnames=("i",))
def test_bit(a, i: int):
    """Bit i of a 256-bit value, as a batch bool."""
    return ((a[..., i // LIMB_BITS] >> _U32(i % LIMB_BITS)) & _U32(1)) == 1


@jax.jit
def is_even(a):
    return (a[..., 0] & _U32(1)) == 0


# ---------------------------------------------------------------------------
# Prefix extraction (for the baby-table keys)


@jax.jit
def x_prefix64(x):
    """Low 64 bits of a field element as (hi32, lo32) uint32 pair.

    The baby table keys on a 64-bit prefix of the X coordinate, like the
    reference's 8-byte X-prefix entries (1_9_7File.pb:2555-2622); we take
    the low 64 bits (uniformly distributed for random points).
    """
    lo = x[..., 0] | (x[..., 1] << LIMB_BITS)
    hi = x[..., 2] | (x[..., 3] << LIMB_BITS)
    return hi, lo
