"""Pallas Montgomery kernel vs the jnp limb path (interpret mode on CPU)."""

import random

import jax.numpy as jnp
import pytest

from zkecdsa_tpu.ops.limbs import P256_P, TOM_P
from zkecdsa_tpu.ops.pallas.mont import mont_mul


@pytest.mark.parametrize("ctx", [P256_P, TOM_P], ids=lambda c: c.name)
def test_pallas_mont_mul_matches(ctx):
    rand = random.Random(4)
    p = ctx.p
    xs = [rand.randrange(p) for _ in range(20)] + [0, 1, p - 1]
    ys = [rand.randrange(p) for _ in range(20)] + [p - 1, p - 1, p - 1]
    a = jnp.asarray(ctx.pack(xs))
    b = jnp.asarray(ctx.pack(ys))
    got = ctx.unpack(mont_mul(ctx, a, b, interpret=True))
    assert got == [x * y % p for x, y in zip(xs, ys)]
