"""Device limb arithmetic property tests vs Python ints (the host int plays
the role V8 BigInt plays for the reference's tests).

All ops per field run inside ONE jitted function with uniform shapes, so
each field costs exactly one compile.
"""

import random

import jax
import jax.numpy as jnp
import pytest

from zkecdsa_tpu.ops.limbs import P256_N, P256_P, TOM_N, TOM_P

B = 12  # uniform test batch


def _vectors(ctx, seed):
    rand = random.Random(seed)
    p = ctx.p
    xs = [rand.randrange(p) for _ in range(B - 4)] + [0, 1, p - 1, p - 1]
    ys = [rand.randrange(p) for _ in range(B - 4)] + [p - 1, 0, p - 1, 1]
    return xs, ys


@pytest.fixture(scope="module", params=["p256.p", "p256.n", "tom.p", "tom.n"])
def case(request):
    ctx = {
        "p256.p": P256_P,
        "p256.n": P256_N,
        "tom.p": TOM_P,
        "tom.n": TOM_N,
    }[request.param]
    xs, ys = _vectors(ctx, hash(request.param) & 0xFFFF)
    a = jnp.asarray(ctx.pack(xs))
    b = jnp.asarray(ctx.pack(ys))
    a_std = jnp.asarray(ctx.pack(xs, mont=False))

    @jax.jit
    def everything(a, b, a_std):
        safe = jnp.where(jnp.all(a == 0, axis=-1, keepdims=True), b, a)
        return {
            "add": ctx.add(a, b),
            "sub": ctx.sub(a, b),
            "neg": ctx.neg(a),
            "mul": ctx.mul(a, b),
            "mul3": ctx.mul_small(a, 3),
            "mul8": ctx.mul_small(a, 8),
            "inv": ctx.inv(safe),
            "binv": ctx.batch_inv(a),
            "mont_rt": ctx.from_mont(ctx.to_mont(a_std)),
            "bcast": ctx.mul(a, b[0]),
        }

    out = jax.tree.map(lambda x: x, everything(a, b, a_std))
    return ctx, xs, ys, out


def test_pack_unpack_round_trip(case):
    ctx, xs, ys, out = case
    assert ctx.unpack(jnp.asarray(ctx.pack(xs))) == xs
    assert ctx.unpack(jnp.asarray(ctx.pack(xs, mont=False)), mont=False) == xs


def test_add_sub_neg(case):
    ctx, xs, ys, out = case
    p = ctx.p
    assert ctx.unpack(out["add"]) == [(x + y) % p for x, y in zip(xs, ys)]
    assert ctx.unpack(out["sub"]) == [(x - y) % p for x, y in zip(xs, ys)]
    assert ctx.unpack(out["neg"]) == [(-x) % p for x in xs]
    assert ctx.unpack(out["mul3"]) == [3 * x % p for x in xs]
    assert ctx.unpack(out["mul8"]) == [8 * x % p for x in xs]


def test_mul(case):
    ctx, xs, ys, out = case
    p = ctx.p
    assert ctx.unpack(out["mul"]) == [x * y % p for x, y in zip(xs, ys)]
    assert ctx.unpack(out["bcast"]) == [x * ys[0] % p for x in xs]


def test_inv_and_batch_inv(case):
    ctx, xs, ys, out = case
    p = ctx.p
    safe = [x if x != 0 else y for x, y in zip(xs, ys)]
    assert ctx.unpack(out["inv"]) == [pow(x, -1, p) for x in safe]
    # batch_inv maps zero to zero
    assert ctx.unpack(out["binv"]) == [
        pow(x, -1, p) if x != 0 else 0 for x in xs
    ]


def test_mont_domain_conversion(case):
    ctx, xs, ys, out = case
    assert ctx.unpack(out["mont_rt"], mont=False) == xs
