"""EC layer tests vs the pure-Python oracle (reference strategy:
lib/Curve64.pb self-test vectors + randomized cross-checks)."""

import numpy as np
import jax.numpy as jnp

from bsgs_tpu.ops import field as F, ec
from bsgs_tpu.utils import ecpy


def pt_limbs(pts):
    xs = jnp.asarray(F.to_limbs_batch([p[0] for p in pts]))
    ys = jnp.asarray(F.to_limbs_batch([p[1] for p in pts]))
    return xs, ys


def pt_ints(xs, ys, i):
    return (
        int(F.from_limbs_batch(np.asarray(xs))[i]),
        int(F.from_limbs_batch(np.asarray(ys))[i]),
    )


def test_point_dbl_known():
    # 2G known-answer (the reference self-test uses G+2G == 3G,
    # lib/Curve64.pb:3067-3397; same anchors here)
    xs, ys = pt_limbs([ecpy.G])
    x2, y2 = ec.point_dbl(xs, ys)
    assert pt_ints(x2, y2, 0) == ecpy.dbl(ecpy.G)


def test_point_add_full_random(rng):
    ks1 = [int(rng.integers(1, 1 << 62)) for _ in range(6)]
    ks2 = [int(rng.integers(1, 1 << 62)) for _ in range(6)]
    p1 = [ecpy.mul(k) for k in ks1]
    p2 = [ecpy.mul(k) for k in ks2]
    x1, y1 = pt_limbs(p1)
    x2, y2 = pt_limbs(p2)
    inf = jnp.zeros(len(ks1), bool)
    x3, y3, inf3 = ec.point_add_full(x1, y1, inf, x2, y2, inf)
    assert not np.any(np.asarray(inf3))
    for i in range(len(ks1)):
        assert pt_ints(x3, y3, i) == ecpy.add(p1[i], p2[i])


def test_point_add_full_edges():
    g = ecpy.G
    g2 = ecpy.dbl(g)
    cases = [
        (g, g, ecpy.dbl(g)),          # doubling via add
        (g, ecpy.neg(g), None),       # P + (-P) = inf
        (g2, g, ecpy.add(g2, g)),     # ordinary
    ]
    x1, y1 = pt_limbs([c[0] for c in cases])
    x2, y2 = pt_limbs([c[1] for c in cases])
    inf = jnp.zeros(len(cases), bool)
    x3, y3, inf3 = ec.point_add_full(x1, y1, inf, x2, y2, inf)
    inf3 = np.asarray(inf3)
    for i, (_, _, expect) in enumerate(cases):
        if expect is None:
            assert inf3[i]
        else:
            assert not inf3[i]
            assert pt_ints(x3, y3, i) == expect
    # infinity flag propagation: inf + P = P
    x3, y3, inf3 = ec.point_add_full(
        x1, y1, jnp.ones(len(cases), bool), x2, y2, jnp.zeros(len(cases), bool)
    )
    assert not np.any(np.asarray(inf3))
    for i, c in enumerate(cases):
        assert pt_ints(x3, y3, i) == c[1]


def test_scalar_mul(rng):
    ks = [1, 2, 3, 7, int(rng.integers(1, 1 << 63)), ecpy.N - 1]
    kl = jnp.asarray(F.to_limbs_batch(ks))
    gx = jnp.broadcast_to(jnp.asarray(F.to_limbs(ecpy.GX)), (len(ks), 16))
    gy = jnp.broadcast_to(jnp.asarray(F.to_limbs(ecpy.GY)), (len(ks), 16))
    x, y, inf = ec.scalar_mul(kl, gx, gy)
    assert not np.any(np.asarray(inf))
    for i, k in enumerate(ks):
        assert pt_ints(x, y, i) == ecpy.mul(k), f"k={k}"


def test_batch_inv(rng):
    xs = [int.from_bytes(rng.bytes(32), "little") % ecpy.P for _ in range(515)]
    xs = [x if x else 1 for x in xs]
    inv = ec.batch_inv(jnp.asarray(F.to_limbs_batch(xs)), chunk=64)
    got = F.from_limbs_batch(np.asarray(inv))
    for i, x in enumerate(xs):
        assert int(got[i]) == pow(x, -1, ecpy.P), f"case {i}"


def test_add_common_with_degenerates():
    # batch contains C itself (doubling) and other multiples
    c = ecpy.mul(5)
    pts = [ecpy.mul(k) for k in [1, 2, 5, 9]]
    px, py = pt_limbs(pts)
    cx, cy = pt_limbs([c])
    d = ecpy.dbl(c)
    dx, dy = pt_limbs([d])
    x3, y3, inf = ec.add_common(px, py, cx[0], cy[0], dx[0], dy[0], chunk=2)
    assert not np.any(np.asarray(inf))
    for i, k in enumerate([1, 2, 5, 9]):
        assert pt_ints(x3, y3, i) == ecpy.mul(k + 5), f"k={k}"
    # P == -C lane flags infinity
    pts2 = [ecpy.mul(3), ecpy.neg(c)]
    px2, py2 = pt_limbs(pts2)
    _, _, inf2 = ec.add_common(px2, py2, cx[0], cy[0], dx[0], dy[0], chunk=2)
    assert list(np.asarray(inf2)) == [False, True]


def test_fill_multiples():
    # [G, 2G, ..., nG] including the power-of-two doubling boundaries
    n = 13
    bx, by = ec.fill_multiples(ecpy.G, ecpy.G, n)
    for i in range(n):
        assert pt_ints(bx, by, i) == ecpy.mul(i + 1), f"i={i}"
    # strided variant: base=7G step=3G
    bx, by = ec.fill_multiples(ecpy.mul(7), ecpy.mul(3), 8)
    for i in range(8):
        assert pt_ints(bx, by, i) == ecpy.mul(7 + 3 * i)


def test_extend_tile():
    n = 8
    bx, by = ec.fill_multiples(ecpy.G, ecpy.G, n)
    c = ecpy.mul(n)
    cx, cy = pt_limbs([c])
    dx, dy = pt_limbs([ecpy.dbl(c)])
    nx, ny, inf = ec.extend_tile(bx, by, cx[0], cy[0], dx[0], dy[0])
    assert not np.any(np.asarray(inf))
    for i in range(n):
        assert pt_ints(nx, ny, i) == ecpy.mul(i + 1 + n)
