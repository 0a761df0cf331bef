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


def test_msm_ladder_matches_msm():
    import jax.numpy as jnp

    from zkecdsa_tpu.ops.curve_ops import nibble_digits, scalar_bits, tom_ops

    g = tomEdwards256
    G = g.generator()
    pts = [G.mul(g.new_scalar(i + 2)) for i in range(6)]
    scs = [g.random_scalar().k for _ in range(6)]
    arr = jnp.asarray(tom_ops.pack_points(pts))
    win = tom_ops.msm(arr, jnp.asarray(nibble_digits(scs)))
    lad = tom_ops.msm_ladder(arr, jnp.asarray(scalar_bits(scs)))
    assert bool(tom_ops.eq(win, lad))
    want = g.identity()
    for p, s in zip(pts, scs):
        want = want.add(p.mul(g.new_scalar(s)))
    got = tom_ops.unpack_points(lad[None])[0]
    assert got.eq(want)


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


@pytest.mark.slow
def test_batched_verify_mixed_batch():
    """One good proof, one tampered, one for a different ring position -
    per-instance verdicts must be independent."""
    from zkecdsa_tpu.protocol.batch_verify import BatchVerifier

    with rng.deterministic(11):
        params = generate_params_list()
        msgs, proofs, ring, kps, pubs = [], [], [], [], []
        for i in range(2):
            kp = ecdsa.generate_keypair()
            pub = ecdsa.export_public_raw(kp)
            kps.append(kp)
            pubs.append(pub)
            ring.append(ecdsa.key_to_int(pub))
        ring += [21, 22]
        for i in range(2):
            msg = f"mixed {i}".encode()
            mh = hashlib.sha256(msg).digest()
            msgs.append(mh)
            proofs.append(
                prove_signature_list(
                    params, mh, ecdsa.sign(kps[i], msg), pubs[i], i, ring
                )
            )
        bv = BatchVerifier(params)
        assert bv.verify(msgs, ring, proofs) == [True, True]
        # tamper with one GK response scalar
        saved = proofs[1].membershipProof.f[0]
        proofs[1].membershipProof.f[0] = proofs[1].membershipProof.f[1]
        assert bv.verify(msgs, ring, proofs) == [True, False]
        proofs[1].membershipProof.f[0] = saved
        # malformed structure: truncated exp rounds -> False, not a raise
        saved_exp = proofs[0].expProof
        proofs[0].expProof = saved_exp[:10]
        assert bv.verify(msgs, ring, proofs) == [False, True]
        proofs[0].expProof = saved_exp


@pytest.mark.slow
def test_combined_msm_path_and_fallback(monkeypatch):
    """The hierarchical combined identity check (batch_verify.
    _combined_msm_identity): with _COMB_W shrunk the small test batch
    crosses the 4*W threshold, so the honest case runs the combined
    fixed-block MSM and the tampered case exercises the per-row
    attribution fallback - verdicts must match the per-row path."""
    from zkecdsa_tpu.protocol import batch_verify as bvmod
    from zkecdsa_tpu.protocol.batch_verify import BatchVerifier

    with rng.deterministic(13):
        params = generate_params_list()
        msgs, proofs, ring, kps, pubs = [], [], [], [], []
        for i in range(2):
            kp = ecdsa.generate_keypair()
            pub = ecdsa.export_public_raw(kp)
            kps.append(kp)
            pubs.append(pub)
            ring.append(ecdsa.key_to_int(pub))
        ring += [31, 32]
        for i in range(2):
            msg = f"comb {i}".encode()
            mh = hashlib.sha256(msg).digest()
            msgs.append(mh)
            proofs.append(
                prove_signature_list(
                    params, mh, ecdsa.sign(kps[i], msg), pubs[i], i, ring
                )
            )
        monkeypatch.setattr(bvmod, "_COMB_W", 64)
        bv = BatchVerifier(params)
        assert bv.verify(msgs, ring, proofs) == [True, True]
        # tamper -> combined check fails -> per-row attribution
        saved = proofs[1].membershipProof.f[0]
        proofs[1].membershipProof.f[0] = proofs[1].membershipProof.f[1]
        assert bv.verify(msgs, ring, proofs) == [True, False]
        proofs[1].membershipProof.f[0] = saved
