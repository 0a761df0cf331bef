"""Batched device curve kernels vs the host scalar layer.

All device computations per curve run in ONE jitted function (single
trace/compile), then individual tests assert against host-layer results.
"""

import random

import jax
import jax.numpy as jnp
import pytest

from zkecdsa_tpu.curves import p256, tomEdwards256
from zkecdsa_tpu.ops.curve_ops import nibble_digits, p256_ops, tom_ops

B = 4


def _build(ops, g):
    rand = random.Random(77)
    G = g.generator()
    pts = [G.mul(g.new_scalar(rand.randrange(1, g.order))) for _ in range(B)]
    qts = [G.mul(g.new_scalar(rand.randrange(1, g.order))) for _ in range(B)]
    ss = [rand.randrange(g.order) for _ in range(B - 1)] + [0]
    s2 = [rand.randrange(g.order) for _ in range(B)]
    P = jnp.asarray(ops.pack_points(pts))
    Q = jnp.asarray(ops.pack_points(qts))
    d1 = jnp.asarray(nibble_digits(ss))
    d2 = jnp.asarray(nibble_digits(s2))

    @jax.jit
    def everything(P, Q, d1, d2):
        ident = ops.identity((B,))
        return {
            "add": ops.add(P, Q),
            "dbl": ops.dbl(P),
            "self_add": ops.add(P, P),
            "neg": ops.neg(P),
            "add_ident": ops.add(P, ident),
            "p_minus_p": ops.is_identity(ops.add(P, ops.neg(P))),
            "smul": ops.scalar_mul(P, d1),
            "dmul": ops.double_mul(P, d1, Q, d2),
            "msm": ops.msm(P, d1),
            "msm_shared": ops.msm_shared(P, d1),
            "msm_shared_rows": ops.msm_shared(
                jnp.stack([P, Q]), jnp.stack([d1, d2])
            ),
            "affine": ops.to_affine(P),
            "ident_affine": ops.to_affine(ident),
        }

    out = jax.tree.map(lambda x: x, everything(P, Q, d1, d2))
    return ops, g, pts, qts, ss, s2, out


@pytest.fixture(scope="module", params=["p256", "tom"])
def case(request):
    if request.param == "p256":
        return _build(p256_ops, p256)
    return _build(tom_ops, tomEdwards256)


def test_add_dbl_neg_identity(case):
    ops, g, pts, qts, ss, s2, out = case
    got = ops.unpack_points(out["add"])
    assert all(a.add(b).eq(o) for a, b, o in zip(pts, qts, got))
    got = ops.unpack_points(out["dbl"])
    assert all(h.dbl().eq(o) for h, o in zip(pts, got))
    # complete formulas: add(P, P) == dbl(P)
    got = ops.unpack_points(out["self_add"])
    assert all(h.dbl().eq(o) for h, o in zip(pts, got))
    got = ops.unpack_points(out["neg"])
    assert all(h.neg().eq(o) for h, o in zip(pts, got))
    got = ops.unpack_points(out["add_ident"])
    assert all(h.eq(o) for h, o in zip(pts, got))
    assert bool(out["p_minus_p"].all())


def test_scalar_mul_matches_host(case):
    ops, g, pts, qts, ss, s2, out = case
    got = ops.unpack_points(out["smul"])
    expect = [h.mul(g.new_scalar(s)) for h, s in zip(pts, ss)]
    assert all(h.eq(o) for h, o in zip(expect, got))


def test_double_mul_matches_host(case):
    ops, g, pts, qts, ss, s2, out = case
    got = ops.unpack_points(out["dmul"])
    expect = [
        p.dblmul(g.new_scalar(a), q, g.new_scalar(b))
        for p, q, a, b in zip(pts, qts, ss, s2)
    ]
    assert all(h.eq(o) for h, o in zip(expect, got))


def test_msm_matches_host(case):
    ops, g, pts, qts, ss, s2, out = case
    got = ops.unpack_points(out["msm"][None])[0]
    acc = g.identity()
    for h, s in zip(pts, ss):
        acc = acc.add(h.mul(g.new_scalar(s)))
    assert acc.eq(got)


def test_msm_shared_matches_host(case):
    ops, g, pts, qts, ss, s2, out = case
    got = ops.unpack_points(out["msm_shared"][None])[0]
    acc = g.identity()
    for h, s in zip(pts, ss):
        acc = acc.add(h.mul(g.new_scalar(s)))
    assert acc.eq(got)
    # batched rows: [2, B] terms -> [2] independent MSMs
    r0, r1 = ops.unpack_points(out["msm_shared_rows"])
    assert acc.eq(r0)
    acc2 = g.identity()
    for h, s in zip(qts, s2):
        acc2 = acc2.add(h.mul(g.new_scalar(s)))
    assert acc2.eq(r1)


def test_to_affine_matches_host(case):
    ops, g, pts, qts, ss, s2, out = case
    x, y, inf = out["affine"]
    xs, ys = ops.f.unpack(x), ops.f.unpack(y)
    assert not bool(inf.any())
    for h, xx, yy in zip(pts, xs, ys):
        assert h.to_affine() == (xx, yy)
    ix, iy, iinf = out["ident_affine"]
    if ops is p256_ops:
        # Weierstrass identity (0:1:0) is at infinity
        assert bool(iinf.all())
    else:
        # Edwards identity (0:1:0:1) is the affine point (0, 1)
        assert not bool(iinf.any())
        assert ops.f.unpack(ix) == [0] * B and ops.f.unpack(iy) == [1] * B


def test_sum_reduce_odd_padding():
    # non-power-of-two reduction pads with the identity
    ops, g = tom_ops, tomEdwards256
    pts = [g.generator().mul(g.new_scalar(k)) for k in (3, 5, 9)]
    P = jnp.asarray(ops.pack_points(pts))
    got = ops.unpack_points(ops.sum_reduce(P)[None])[0]
    assert got.eq(g.generator().mul(g.new_scalar(17)))


def test_msm_pippenger_matches_host():
    import numpy as np

    from zkecdsa_tpu.curves import tomEdwards256 as g
    from zkecdsa_tpu.ops.curve_ops import tom_ops
    import jax.numpy as jnp

    rs = np.random.RandomState(3)
    T = 37  # non-power-of-two, with duplicate and zero scalars
    G = g.generator()
    pts = [G.mul(g.new_scalar(k + 2)) for k in range(T)]
    scs = [int.from_bytes(rs.bytes(32), "big") for _ in range(T - 3)]
    scs += [0, scs[0], 1]  # zero scalar, duplicate, unit
    arr = jnp.asarray(tom_ops.pack_points(pts))
    got = tom_ops.unpack_points(tom_ops.msm_pippenger(arr, scs)[None])[0]
    want = g.identity()
    for p, s in zip(pts, scs):
        want = want.add(p.mul(g.new_scalar(s)))
    assert got.eq(want)


def test_msm_pippenger_window4_matches():
    import numpy as np

    from zkecdsa_tpu.curves import p256 as g
    from zkecdsa_tpu.ops.curve_ops import p256_ops
    import jax.numpy as jnp

    rs = np.random.RandomState(4)
    T = 16
    G = g.generator()
    pts = [G.mul(g.new_scalar(k + 5)) for k in range(T)]
    scs = [int.from_bytes(rs.bytes(32), "big") for _ in range(T)]
    arr = jnp.asarray(p256_ops.pack_points(pts))
    got = p256_ops.unpack_points(
        p256_ops.msm_pippenger(arr, scs, window=4)[None]
    )[0]
    want = g.identity()
    for p, s in zip(pts, scs):
        want = want.add(p.mul(g.new_scalar(s)))
    assert got.eq(want)


def test_comb_mul_matches_host():
    """Fixed-base comb multiply (device-built table, one-hot MXU gathers)
    vs host windowed multiplication - exact for random/edge scalars."""
    import numpy as np
    import jax.numpy as jnp

    from zkecdsa_tpu.curves import p256, tomEdwards256
    from zkecdsa_tpu.ops.curve_ops import byte_digits, p256_ops, tom_ops

    rs = np.random.RandomState(8)
    for g, ops in ((tomEdwards256, tom_ops), (p256, p256_ops)):
        base = g.generator().mul(g.new_scalar(7))
        comb = ops.comb_table(jnp.asarray(ops.pack_points([base]))[0])
        scs = [int.from_bytes(rs.bytes(32), "big") % g.order for _ in range(6)]
        scs += [0, 1, g.order - 1]
        d8 = jnp.asarray(byte_digits(scs))
        got = ops.unpack_points(np.asarray(ops.mul_comb(comb, d8)))
        for pt, s in zip(got, scs):
            assert pt.eq(base.mul(g.new_scalar(s))), s


def test_double_mul_comb_matches_host():
    import numpy as np
    import jax.numpy as jnp

    from zkecdsa_tpu.curves import tomEdwards256 as g
    from zkecdsa_tpu.ops.curve_ops import byte_digits, tom_ops

    rs = np.random.RandomState(9)
    P = g.generator()
    Q = g.generator().mul(g.new_scalar(12345))
    cp = tom_ops.comb_table(jnp.asarray(tom_ops.pack_points([P]))[0])
    cq = tom_ops.comb_table(jnp.asarray(tom_ops.pack_points([Q]))[0])
    a = [int.from_bytes(rs.bytes(32), "big") % g.order for _ in range(4)]
    b = [int.from_bytes(rs.bytes(32), "big") % g.order for _ in range(4)]
    got = tom_ops.unpack_points(
        np.asarray(
            tom_ops.double_mul_comb(
                cp, jnp.asarray(byte_digits(a)), cq, jnp.asarray(byte_digits(b))
            )
        )
    )
    for pt, x, y in zip(got, a, b):
        assert pt.eq(P.mul(g.new_scalar(x)).add(Q.mul(g.new_scalar(y))))


def test_double_mul_comb_mixed_matches_host():
    """The mixed-add comb path (affine table entries with precomputed
    d*T2 / a*X2 / X2+Y2 - EdwardsOps.comb_table_mixed/add_mixed) must be
    point-identical to the standard comb path and to host arithmetic,
    including the scalar-0 (identity table entry) and order-1 edges."""
    import numpy as np
    import jax.numpy as jnp

    from zkecdsa_tpu.curves import tomEdwards256 as g
    from zkecdsa_tpu.ops.curve_ops import byte_digits, tom_ops

    rs = np.random.RandomState(10)
    P = g.generator().mul(g.new_scalar(777))
    Q = g.generator().mul(g.new_scalar(31337))
    cp = tom_ops.comb_table_mixed(jnp.asarray(tom_ops.pack_points([P]))[0])
    cq = tom_ops.comb_table_mixed(jnp.asarray(tom_ops.pack_points([Q]))[0])
    assert cp.shape[-2] == tom_ops.MIXED_NC
    a = [int.from_bytes(rs.bytes(32), "big") % g.order for _ in range(3)]
    a += [0, g.order - 1]
    b = [int.from_bytes(rs.bytes(32), "big") % g.order for _ in range(3)]
    b += [1, 0]
    got = tom_ops.unpack_points(
        np.asarray(
            tom_ops.double_mul_comb_mixed(
                cp, jnp.asarray(byte_digits(a)), cq, jnp.asarray(byte_digits(b))
            )
        )
    )
    for pt, x, y in zip(got, a, b):
        assert pt.eq(P.mul(g.new_scalar(x)).add(Q.mul(g.new_scalar(y))))
