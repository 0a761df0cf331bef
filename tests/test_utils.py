"""Config / profiling / rng seam tests."""

import jax.numpy as jnp

from zkecdsa_tpu.utils import rng
from zkecdsa_tpu.utils.config import Config
from zkecdsa_tpu.utils.profiling import StageTimer, kernel_ns_per_op


def test_deterministic_rng_replays():
    with rng.deterministic(1):
        a = rng.random_bytes(16)
    with rng.deterministic(1):
        b = rng.random_bytes(16)
    assert a == b
    with rng.deterministic(2):
        c = rng.random_bytes(16)
    assert a != c


def test_scoped_source_restores():
    base = rng.get_source()
    with rng.scoped(rng.DeterministicSource(3)) as s:
        assert rng.get_source() is s
    assert rng.get_source() is base


def test_config_defaults():
    cfg = Config()
    assert cfg.sec_level == 80
    assert cfg.verify_rounds == 20  # zkpAttestList.ts:177 behavior


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()


def test_kernel_ns_per_op():
    f = lambda x: x + 1
    ns = kernel_ns_per_op(f, (jnp.arange(128),), n_ops=128, iters=3, warmup=1)
    assert ns > 0


def test_fiat_shamir_matches_hash_points():
    """Vectorized challenge hashing == host hash_points, byte for byte
    (the batched prover's Fiat-Shamir contract; group.ts:221-233)."""
    import numpy as np

    from zkecdsa_tpu.bignum import big
    from zkecdsa_tpu.curves.group import hash_points
    from zkecdsa_tpu.curves.instances import p256, tomEdwards256
    from zkecdsa_tpu.ops.f32field import P256_P, TOM_P
    from zkecdsa_tpu.protocol.fiat_shamir import (
        be_bytes,
        challenge_rows,
        point_bytes,
    )

    rs = np.random.RandomState(11)
    vals = [int.from_bytes(rs.bytes(34), "big") % TOM_P.p for _ in range(40)]
    bb = be_bytes(TOM_P, TOM_P.pack(vals), 33)
    assert all(
        bb[i].tobytes() == big.to_bytes(vals[i], 33) for i in range(len(vals))
    )

    # two rows of [tom, tom, p256] points, hashed in one batch
    tg, ng = tomEdwards256, p256
    tpts = [tg.generator().mul(tg.new_scalar(k + 2)) for k in range(4)]
    npts = [ng.generator().mul(ng.new_scalar(k + 5)) for k in range(2)]
    taff = [p.to_affine() for p in tpts]
    naff = [p.to_affine() for p in npts]
    tb = point_bytes(
        TOM_P, TOM_P.pack([a[0] for a in taff]), TOM_P.pack([a[1] for a in taff]), 33
    ).reshape(2, 2 * 67)
    nb = point_bytes(
        P256_P, P256_P.pack([a[0] for a in naff]), P256_P.pack([a[1] for a in naff]), 32
    ).reshape(2, 65)
    got = challenge_rows([tb, nb])
    want = [
        hash_points([tpts[0], tpts[1], npts[0]]),
        hash_points([tpts[2], tpts[3], npts[1]]),
    ]
    assert got == want
