"""Planar (16, W) field ops must be bit-identical to ops/field.py.

Mirrors the reference library's vector self-test idea
(lib/Curve64.pb:3067-3397): every op cross-checked against an independent
implementation on random values + adversarial edge values.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bsgs_tpu.ops import field as F, planar as P


def rand_elems(rng, n):
    """(n,) host ints < p, salted with edge values."""
    edge = [0, 1, 2, F.P_INT - 1, F.P_INT - 2, (1 << 256) % F.P_INT,
            0xFFFFFFFFFFFFFFFF, F.P_INT >> 1]
    vals = [int.from_bytes(rng.bytes(32), "little") % F.P_INT
            for _ in range(n - len(edge))]
    return edge + vals


def to_planar(xs):
    return jnp.asarray(F.to_limbs_batch(xs).T)  # (16, n)


def planar_ints(a):
    return F.from_limbs_batch(np.asarray(a).T)


@pytest.fixture
def ab(rng):
    n = 64
    a_int = rand_elems(rng, n)
    b_int = list(reversed(rand_elems(rng, n)))
    return a_int, b_int, to_planar(a_int), to_planar(b_int)


def test_add_sub_neg_mod(ab):
    a_int, b_int, a, b = ab
    got = planar_ints(P.add_mod(a, b))
    exp = [(x + y) % F.P_INT for x, y in zip(a_int, b_int)]
    assert list(got) == exp
    got = planar_ints(P.sub_mod(a, b))
    exp = [(x - y) % F.P_INT for x, y in zip(a_int, b_int)]
    assert list(got) == exp
    got = planar_ints(P.neg_mod(a))
    assert list(got) == [(-x) % F.P_INT for x in a_int]


def test_mul_sqr_mod(ab):
    a_int, b_int, a, b = ab
    got = planar_ints(P.mul_mod(a, b))
    assert list(got) == [(x * y) % F.P_INT for x, y in zip(a_int, b_int)]
    got = planar_ints(P.sqr_mod(a))
    assert list(got) == [(x * x) % F.P_INT for x in a_int]


def test_inv_chain(ab):
    a_int, _, a, _ = ab
    got = planar_ints(P.inv_mod_chain(a))
    exp = [pow(x, F.P_INT - 2, F.P_INT) for x in a_int]
    assert list(got) == exp


def test_predicates_and_prefix(ab):
    a_int, b_int, a, b = ab
    assert list(np.asarray(P.is_zero(a)).ravel()) == [x == 0 for x in a_int]
    assert list(np.asarray(P.eq(a, a)).ravel()) == [True] * len(a_int)
    hi, lo = P.x_prefix64(a)
    for i, x in enumerate(a_int):
        assert int(lo[0, i]) == x & 0xFFFFFFFF
        assert int(hi[0, i]) == (x >> 32) & 0xFFFFFFFF
    # bucket/disc must agree with the table module's row-major split
    from bsgs_tpu.models import table as T
    bk_p, d_p = P.bucket_disc(hi, lo, 20)
    bk_r, d_r = T.bucket_disc(hi, lo, 20)
    assert np.array_equal(np.asarray(bk_p), np.asarray(bk_r))
    assert np.array_equal(np.asarray(d_p), np.asarray(d_r))


def test_iota_constants():
    # p_col/one_col are rebuilt from iota arithmetic (Pallas const rule);
    # they must equal the host-serialized limbs exactly
    assert np.array_equal(np.asarray(P.p_col()), P.const_col(F.P_INT))
    assert np.array_equal(np.asarray(P.one_col()), P.const_col(1))


def test_roundtrip_layout(ab):
    _, _, a, _ = ab
    assert np.array_equal(np.asarray(P.from_rows(P.to_rows(a))), np.asarray(a))
