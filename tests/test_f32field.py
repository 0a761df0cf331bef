"""Property tests for the float32 digit field engine against Python ints
(the same role V8 BigInt plays in the reference's tests, SURVEY section 4:
algebraic-property randomized testing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkecdsa_tpu.ops.f32field import (
    BASE_BITS,
    F32Field,
    P256_N,
    P256_P,
    TOM_N,
    TOM_P,
    WAR_P,
)

FIELDS = [P256_P, P256_N, TOM_P, TOM_N, WAR_P]
IDS = [f.name for f in FIELDS]

rng = np.random.default_rng(0xF32)


def rand_ints(p, n):
    vals = [int.from_bytes(rng.bytes(40), "big") % p for _ in range(n - 4)]
    return vals + [0, 1, p - 1, p - 2]


@pytest.mark.parametrize("f", FIELDS, ids=IDS)
def test_pack_unpack_roundtrip(f):
    vals = rand_ints(f.p, 32)
    arr = f.pack(vals)
    assert arr.dtype == np.float32
    assert np.all(arr >= 0) and np.all(arr < 128)
    assert f.unpack(arr) == [v % f.p for v in vals]


@pytest.mark.parametrize("f", FIELDS, ids=IDS)
def test_field_ops_vs_int(f):
    """One jitted program per field exercising every op; results compared
    to exact integer arithmetic."""
    n = 64
    a_i = rand_ints(f.p, n)
    b_i = rand_ints(f.p, n)
    a = jnp.asarray(f.pack(a_i))
    b = jnp.asarray(f.pack(b_i))

    @jax.jit
    def go(a, b):
        return {
            "add": f.add(a, b),
            "sub": f.sub(a, b),
            "neg": f.neg(a),
            "dbl": f.dbl(a),
            "mul": f.mul(a, b),
            "mul3": f.mul_small(a, 3),
            "mul_chain": f.mul(f.mul(a, b), f.add(a, b)),
            "lazy": f.mul(f.add_lazy(f.add_lazy(a, b), a), b),
            "sqr": f.sqr(a),
            "canon": f.canon(f.mul(a, b)),
        }

    out = go(a, b)
    p = f.p
    assert f.unpack(out["add"]) == [(x + y) % p for x, y in zip(a_i, b_i)]
    assert f.unpack(out["sub"]) == [(x - y) % p for x, y in zip(a_i, b_i)]
    assert f.unpack(out["neg"]) == [(-x) % p for x in a_i]
    assert f.unpack(out["dbl"]) == [2 * x % p for x in a_i]
    assert f.unpack(out["mul"]) == [x * y % p for x, y in zip(a_i, b_i)]
    assert f.unpack(out["mul3"]) == [3 * x % p for x in a_i]
    assert f.unpack(out["mul_chain"]) == [
        (x * y % p) * ((x + y) % p) % p for x, y in zip(a_i, b_i)
    ]
    assert f.unpack(out["lazy"]) == [
        (2 * x + y) * y % p for x, y in zip(a_i, b_i)
    ]
    assert f.unpack(out["sqr"]) == [x * x % p for x in a_i]
    canon = np.asarray(out["canon"])
    assert np.all(canon >= 0) and np.all(canon < 128)
    assert f.unpack(canon) == [x * y % p for x, y in zip(a_i, b_i)]


@pytest.mark.parametrize("f", [P256_P, TOM_P], ids=["p256.p", "tom.p"])
def test_inv_and_batch_inv(f):
    n = 16
    a_i = rand_ints(f.p, n)[:-4] + [1, 2, f.p - 1, f.p - 2]  # no zeros
    a = jnp.asarray(f.pack(a_i))

    @jax.jit
    def go(a):
        return f.inv(a), f.batch_inv(a)

    inv, binv = go(a)
    want = [pow(x, -1, f.p) for x in a_i]
    assert f.unpack(inv) == want
    assert f.unpack(binv) == want


@pytest.mark.parametrize("f", [P256_P], ids=["p256.p"])
def test_batch_inv_zero_masked(f):
    a_i = [0, 5, 0, 7]
    a = jnp.asarray(f.pack(a_i))
    out = jax.jit(f.batch_inv)(a)
    got = f.unpack(out)
    assert got[0] == 0 and got[2] == 0
    assert got[1] == pow(5, -1, f.p) and got[3] == pow(7, -1, f.p)
    # zero entries come back as exact digit-zero
    assert np.all(np.asarray(out)[0] == 0)


@pytest.mark.parametrize("f", [P256_P, TOM_P], ids=["p256.p", "tom.p"])
def test_zero_predicates_on_redundant_forms(f):
    """A zero produced by arithmetic (value 0, digits not all zero) must
    still test as zero; likewise equality across representatives."""
    a_i = rand_ints(f.p, 8)
    a = jnp.asarray(f.pack(a_i))

    @jax.jit
    def go(a):
        zero_rep = f.sub(f.add(a, a), f.dbl(a))  # == 0, redundant digits
        same_rep = f.add(f.sub(a, a), a)  # == a, different digits
        return f.is_zero(zero_rep), f.equal(same_rep, a), f.is_zero(a)

    z, e, az = go(a)
    assert np.all(np.asarray(z))
    assert np.all(np.asarray(e))
    assert list(np.asarray(az)) == [v == 0 for v in a_i]


@pytest.mark.parametrize("f", [P256_N, TOM_N], ids=["p256.n", "tom.n"])
def test_digits4_matches_host_nibbles(f):
    vals = rand_ints(f.p, 8)
    arr = jnp.asarray(f.pack(vals))
    out = np.asarray(jax.jit(f.digits4)(arr)).astype(np.int64)
    for row, v in zip(out, vals):
        want = [(v >> (4 * (63 - k))) & 0xF for k in range(64)]
        assert list(row) == want


@pytest.mark.parametrize("f", [P256_N, TOM_N], ids=["p256.n", "tom.n"])
def test_digits4_on_redundant_device_digits(f):
    """Regression for the round-2 batched-pipeline break: device op
    outputs keep redundant digits, and window extraction must still give
    the nibbles of the canonical value.  ``digits4`` (safe default) must
    equal ``digits4_canonical(canon(x))`` and the host nibble truth."""
    a_i, b_i = rand_ints(f.p, 8), rand_ints(f.p, 8)
    a, b = jnp.asarray(f.pack(a_i)), jnp.asarray(f.pack(b_i))

    @jax.jit
    def go(a, b):
        prod = f.mul(a, b)  # redundant digits (<= STORED_BOUND)
        return f.digits4(prod), f.digits4_canonical(f.canon(prod))

    safe, via_canon = (np.asarray(x).astype(np.int64) for x in go(a, b))
    assert np.array_equal(safe, via_canon)
    for row, ai, bi in zip(safe, a_i, b_i):
        v = ai * bi % f.p
        want = [(v >> (4 * (63 - k))) & 0xF for k in range(64)]
        assert list(row) == want


def test_pow_const():
    f = P256_P
    vals = rand_ints(f.p, 4)
    a = jnp.asarray(f.pack(vals))
    e = 0xDEADBEEF12345678
    out = jax.jit(lambda x: f.pow_const(x, e))(a)
    assert f.unpack(out) == [pow(v, e, f.p) for v in vals]


def test_broadcasting():
    f = P256_P
    a = jnp.asarray(f.pack(rand_ints(f.p, 6))).reshape(2, 3, -1)
    b = jnp.asarray(f.pack(rand_ints(f.p, 4))[:1])  # broadcasts
    out = jax.jit(f.mul)(a, b)
    assert out.shape == a.shape
    ai = f.unpack(a)
    bi = f.unpack(b)[0]
    assert f.unpack(out) == [x * bi % f.p for x in ai]


@pytest.mark.parametrize("f", [P256_N, TOM_N], ids=["p256.n", "tom.n"])
def test_digits8_canonical_matches_host_bytes(f):
    """LSB-first byte digits (the comb path's digit form) vs int.to_bytes."""
    import jax

    rs = np.random.RandomState(21)
    ints = [int.from_bytes(rs.bytes(31), "big") % f.p for _ in range(8)]
    ints += [0, 1, f.p - 1]
    arr = jnp.asarray(f.pack(ints))
    out = np.asarray(jax.jit(f.digits8_canonical)(arr)).astype(np.int64)
    for row, v in zip(out, ints):
        want = list((v % (1 << 256)).to_bytes(32, "little"))
        assert list(row) == want, v
