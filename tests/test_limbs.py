"""Device limb arithmetic property tests vs Python ints (the host int plays
the role V8 BigInt plays for the reference's tests)."""

import random

import jax
import jax.numpy as jnp
import pytest

from zkecdsa_tpu.ops.limbs import P256_N, P256_P, TOM_N, TOM_P

CTXS = [P256_P, P256_N, TOM_P, TOM_N]


@pytest.fixture(scope="module")
def rand():
    return random.Random(1234)


@pytest.mark.parametrize("ctx", CTXS, ids=lambda c: c.name)
def test_pack_unpack_round_trip(ctx, rand):
    xs = [rand.randrange(ctx.p) for _ in range(8)] + [0, 1, ctx.p - 1]
    a = jnp.asarray(ctx.pack(xs))
    assert ctx.unpack(a) == xs
    b = jnp.asarray(ctx.pack(xs, mont=False))
    assert ctx.unpack(b, mont=False) == xs


@pytest.mark.parametrize("ctx", CTXS, ids=lambda c: c.name)
def test_add_sub_neg(ctx, rand):
    p = ctx.p
    xs = [rand.randrange(p) for _ in range(8)] + [0, 1, p - 1, p - 1]
    ys = [rand.randrange(p) for _ in range(8)] + [0, p - 1, p - 1, 1]
    a, b = jnp.asarray(ctx.pack(xs)), jnp.asarray(ctx.pack(ys))
    assert ctx.unpack(ctx.add(a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert ctx.unpack(ctx.sub(a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert ctx.unpack(ctx.neg(a)) == [(-x) % p for x in xs]
    assert ctx.unpack(ctx.mul_small(a, 3)) == [3 * x % p for x in xs]
    assert ctx.unpack(ctx.mul_small(a, 8)) == [8 * x % p for x in xs]


@pytest.mark.parametrize("ctx", CTXS, ids=lambda c: c.name)
def test_mul(ctx, rand):
    p = ctx.p
    xs = [rand.randrange(p) for _ in range(8)] + [0, 1, p - 1, p - 1]
    ys = [rand.randrange(p) for _ in range(8)] + [p - 1, p - 1, p - 1, 0]
    a, b = jnp.asarray(ctx.pack(xs)), jnp.asarray(ctx.pack(ys))
    assert ctx.unpack(jax.jit(ctx.mul)(a, b)) == [
        x * y % p for x, y in zip(xs, ys)
    ]


@pytest.mark.parametrize("ctx", [P256_P, TOM_P], ids=lambda c: c.name)
def test_inv_and_batch_inv(ctx, rand):
    p = ctx.p
    xs = [rand.randrange(1, p) for _ in range(6)] + [1, p - 1]
    a = jnp.asarray(ctx.pack(xs))
    expected = [pow(x, -1, p) for x in xs]
    assert ctx.unpack(jax.jit(ctx.inv)(a)) == expected
    assert ctx.unpack(jax.jit(ctx.batch_inv)(a)) == expected
    # zeros map to zero in batch_inv (masked by callers)
    z = jnp.asarray(ctx.pack([0, 5, 0, 7]))
    out = ctx.unpack(jax.jit(ctx.batch_inv)(z))
    assert out == [0, pow(5, -1, p), 0, pow(7, -1, p)]


@pytest.mark.parametrize("ctx", [P256_P, TOM_P], ids=lambda c: c.name)
def test_mont_domain_conversion(ctx, rand):
    xs = [rand.randrange(ctx.p) for _ in range(4)]
    a = jnp.asarray(ctx.pack(xs, mont=False))
    m = ctx.to_mont(a)
    assert ctx.unpack(m) == xs  # unpack(mont=True) divides out R
    assert ctx.unpack(ctx.from_mont(m), mont=False) == xs


def test_broadcasting():
    ctx = P256_P
    a = jnp.asarray(ctx.pack([3, 5, 7, 9]))  # [4, L]
    b = jnp.asarray(ctx.pack_scalar(11))  # [L]
    assert ctx.unpack(ctx.mul(a, b)) == [33, 55, 77, 99]
    assert ctx.unpack(ctx.add(a, b)) == [14, 16, 18, 20]
