"""Device MSM backend + batched verification tests."""

import hashlib

import pytest

from zkecdsa_tpu import ecdsa
from zkecdsa_tpu.curves import MultiMult, Relation, p256, tomEdwards256
from zkecdsa_tpu.protocol.verify import (
    batched_verify_signature_list,
    device_msm,
    device_msm_backend,
)
from zkecdsa_tpu.utils import rng
from zkecdsa_tpu.zkp_attest_list import (
    generate_params_list,
    prove_signature_list,
)


@pytest.mark.parametrize("g", [p256, tomEdwards256], ids=lambda g: g.name)
def test_device_msm_matches_host(g):
    G = g.generator()
    pts, scs = [], []
    multi = MultiMult(g)
    for i in range(10):
        pt = G.mul(g.new_scalar(3 * i + 2))
        s = g.random_scalar()
        pts.append(pt)
        scs.append(s.k)
        multi.insert(pt, s)
    host = multi.evaluate()
    assert device_msm(g, pts, scs).eq(host)


def test_device_msm_null_relation_is_identity():
    g = tomEdwards256
    G = g.generator()
    multi = MultiMult(g)
    rel = Relation(g)
    s = g.random_scalar()
    rel.insert(G, s)
    rel.insert(G.neg(), s)
    rel.drain(multi)
    with device_msm_backend():
        # force device path regardless of size threshold
        from zkecdsa_tpu.curves import multimult as mm

        pts, scs = multi._points, [x.k for x in multi._scalars]
        assert device_msm(g, pts, scs).is_identity()


@pytest.mark.slow
def test_batched_verify_end_to_end():
    with rng.deterministic(9):
        params = generate_params_list()
        kp = ecdsa.generate_keypair()
        msg = b"batched verify"
        sig = ecdsa.sign(kp, msg)
        pub = ecdsa.export_public_raw(kp)
        mh = hashlib.sha256(msg).digest()
        ring = [ecdsa.key_to_int(pub), 4, 5, 6]
        proof = prove_signature_list(params, mh, sig, pub, 0, ring)
        ok = batched_verify_signature_list(params, [mh], ring, [proof])
        assert ok == [True]
        # negative: wrong message must fail through the device MSM too
        bad = hashlib.sha256(b"other").digest()
        assert batched_verify_signature_list(params, [bad], ring, [proof]) == [False]
