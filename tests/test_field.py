"""Field arithmetic tests: bit-exact against the pure-Python oracle.

Models the reference's Curve64 self-test strategy (lib/Curve64.pb:3067-3397):
known-answer vectors plus randomized cross-checks between two independent
implementations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bsgs_tpu.ops import field as F
from bsgs_tpu.utils import ecpy

P = F.P_INT


def rand_fe(rng, n):
    """n random field elements as host ints."""
    return [int.from_bytes(rng.bytes(32), "little") % P for _ in range(n)]


def limbs(xs):
    return jnp.asarray(F.to_limbs_batch(xs))


def ints(arr):
    return [int(v) for v in F.from_limbs_batch(np.asarray(arr))]


def test_limb_roundtrip(rng):
    xs = rand_fe(rng, 17) + [0, 1, P - 1, (1 << 256) - 1]
    a = F.to_limbs_batch(xs)
    assert ints(a) == xs
    assert a.dtype == np.uint32
    assert a.shape == (len(xs), 16)


def test_add_raw_carry(rng):
    xs = rand_fe(rng, 8) + [(1 << 256) - 1, (1 << 256) - 1, 0]
    ys = rand_fe(rng, 8) + [(1 << 256) - 1, 1, 0]
    s, c = F.add_raw(limbs(xs), limbs(ys))
    for i, (x, y) in enumerate(zip(xs, ys)):
        total = x + y
        assert ints(s)[i] == total % (1 << 256)
        assert int(c[i]) == total >> 256


def test_sub_raw_borrow(rng):
    xs = rand_fe(rng, 8) + [0, 5]
    ys = rand_fe(rng, 8) + [1, 5]
    d, b = F.sub_raw(limbs(xs), limbs(ys))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert ints(d)[i] == (x - y) % (1 << 256)
        assert int(b[i]) == (1 if x < y else 0)


def test_add_sub_mod(rng):
    xs = rand_fe(rng, 32) + [0, P - 1, P - 1, 1]
    ys = rand_fe(rng, 32) + [0, P - 1, 1, P - 1]
    s = F.add_mod(limbs(xs), limbs(ys))
    d = F.sub_mod(limbs(xs), limbs(ys))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert ints(s)[i] == (x + y) % P, f"add case {i}"
        assert ints(d)[i] == (x - y) % P, f"sub case {i}"


def test_neg_mod(rng):
    xs = rand_fe(rng, 8) + [0, 1, P - 1]
    n = F.neg_mod(limbs(xs))
    for i, x in enumerate(xs):
        assert ints(n)[i] == (-x) % P


def test_mul_mod_random(rng):
    xs = rand_fe(rng, 64)
    ys = rand_fe(rng, 64)
    m = F.mul_mod(limbs(xs), limbs(ys))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert ints(m)[i] == (x * y) % P, f"mul case {i}"


def test_mul_mod_edges():
    edge = [0, 1, 2, P - 1, P - 2, (1 << 255), 0xFFFFFFFFFFFFFFFF,
            F.FOLD_INT, P - F.FOLD_INT]
    xs, ys = [], []
    for x in edge:
        for y in edge:
            xs.append(x % P)
            ys.append(y % P)
    m = F.mul_mod(limbs(xs), limbs(ys))
    got = ints(m)
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert got[i] == (x * y) % P, f"edge case ({x:#x}, {y:#x})"


def test_mul_mod_worst_case_fold():
    # Values whose product's high half is maximal stress the 3-fold chain.
    xs = [P - 1, P - 1, P - 2]
    ys = [P - 1, P - 2, P - 2]
    m = F.mul_mod(limbs(xs), limbs(ys))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert ints(m)[i] == (x * y) % P


def test_sqr_mod(rng):
    xs = rand_fe(rng, 16) + [0, 1, P - 1]
    s = F.sqr_mod(limbs(xs))
    for i, x in enumerate(xs):
        assert ints(s)[i] == (x * x) % P


def test_mul_small(rng):
    xs = rand_fe(rng, 8) + [P - 1, 0]
    for k in [0, 1, 2, 3, 977, 65535]:
        m = F.mul_small_mod(limbs(xs), k)
        for i, x in enumerate(xs):
            assert ints(m)[i] == (x * k) % P, f"k={k} case {i}"


def test_inv_mod(rng):
    xs = rand_fe(rng, 16) + [1, 2, P - 1]
    xs = [x for x in xs if x != 0]
    inv = F.inv_mod(limbs(xs))
    for i, x in enumerate(xs):
        assert ints(inv)[i] == pow(x, -1, P), f"inv case {i}"
    # inv(0) == 0 convention
    z = F.inv_mod(limbs([0]))
    assert ints(z)[0] == 0


def test_sqrt_mod(rng):
    # squares of random values must round-trip (up to sign)
    xs = [x for x in rand_fe(rng, 12) if x != 0]
    sq = [(x * x) % P for x in xs]
    r = F.sqrt_mod(limbs(sq))
    for i, x in enumerate(xs):
        got = ints(r)[i]
        assert got == x or got == P - x


def test_pow_mod_bits(rng):
    xs = rand_fe(rng, 4)
    for e in [1, 2, 3, 65537, P - 2]:
        r = F.pow_mod_bits(limbs(xs), e)
        for i, x in enumerate(xs):
            assert ints(r)[i] == pow(x, e, P)


def test_known_curve_constants():
    """Known-answer checks anchored to secp256k1 (the same constants the
    reference self-test uses, lib/Curve64.pb:49-59): Gy^2 == Gx^3 + 7."""
    gx = limbs([ecpy.GX])
    gy = limbs([ecpy.GY])
    lhs = F.sqr_mod(gy)
    rhs = F.add_mod(F.mul_mod(F.sqr_mod(gx), gx), limbs([7]))
    assert ints(lhs) == ints(rhs)


def test_x_prefix64(rng):
    xs = rand_fe(rng, 8)
    hi, lo = F.x_prefix64(limbs(xs))
    for i, x in enumerate(xs):
        pre = x & ((1 << 64) - 1)
        assert int(lo[i]) == pre & 0xFFFFFFFF
        assert int(hi[i]) == pre >> 32


def test_jit_and_vmap_compat(rng):
    xs = rand_fe(rng, 8)
    ys = rand_fe(rng, 8)
    f = jax.jit(F.mul_mod)
    m = f(limbs(xs), limbs(ys))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert ints(m)[i] == (x * y) % P
    # 2-D batch shape
    a2 = limbs(xs).reshape(2, 4, 16)
    b2 = limbs(ys).reshape(2, 4, 16)
    m2 = F.mul_mod(a2, b2).reshape(8, 16)
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert ints(m2)[i] == (x * y) % P


def test_shift_and_bit_ops(rng):
    xs = rand_fe(rng, 6) + [0, 1, (1 << 256) - 1]
    a = limbs(xs)
    for n in [0, 1, 15, 16, 17, 64, 200, 255]:
        r = F.shr_bits(a, n)
        l = F.shl_bits(a, n)
        for i, x in enumerate(xs):
            assert ints(r)[i] == x >> n, f"shr n={n}"
            assert ints(l)[i] == (x << n) % (1 << 256), f"shl n={n}"
    for i_bit in [0, 1, 16, 255]:
        tb = F.test_bit(a, i_bit)
        for i, x in enumerate(xs):
            assert bool(tb[i]) == bool((x >> i_bit) & 1)
    ev = F.is_even(a)
    for i, x in enumerate(xs):
        assert bool(ev[i]) == (x % 2 == 0)
