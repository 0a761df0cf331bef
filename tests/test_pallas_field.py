"""Pallas fused field/curve kernels vs the XLA-fused engine (exactness:
both trace the SAME field code, so results must be bit-identical)."""

import numpy as np
import jax.numpy as jnp
import pytest

from zkecdsa_tpu.curves.instances import tomEdwards256
from zkecdsa_tpu.ops.curve_ops import tom_ops
from zkecdsa_tpu.ops.f32field import P256_P
from zkecdsa_tpu.ops.pallas_field import pallas_ec_add, pallas_mul

B = 16


def test_pallas_mul_matches_engine():
    f = P256_P
    rs = np.random.RandomState(11)
    a_i = [int.from_bytes(rs.bytes(31), "big") for _ in range(B)]
    b_i = [int.from_bytes(rs.bytes(31), "big") for _ in range(B)]
    a = jnp.asarray(f.pack(a_i))
    b = jnp.asarray(f.pack(b_i))
    got = pallas_mul(f, block=B, interpret=True)(a, b)
    assert f.unpack(got) == [(x * y) % f.p for x, y in zip(a_i, b_i)]


def test_pallas_ec_add_matches_engine():
    g = tomEdwards256
    rs = np.random.RandomState(12)
    P_h = [g.generator().mul(g.new_scalar(int(rs.randint(2, 1 << 20)))) for _ in range(B)]
    Q_h = [g.generator().mul(g.new_scalar(int(rs.randint(2, 1 << 20)))) for _ in range(B)]
    P = jnp.asarray(tom_ops.pack_points(P_h))
    Q = jnp.asarray(tom_ops.pack_points(Q_h))
    got = tom_ops.unpack_points(np.asarray(pallas_ec_add(tom_ops, block=B, interpret=True)(P, Q)))
    for r, p, q in zip(got, P_h, Q_h):
        assert r.eq(p.add(q))
