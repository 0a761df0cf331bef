"""The batched-pipeline correctness gate (trimmed, default-run).

Round 2 shipped a broken batched prover/verifier because the only
cross-checks lived behind ``-m slow`` and the default run deselected them.
This module is the always-on gate: ONE instance, ring of 4 - small enough
for the default suite, still exercising every phase (A/B device programs,
challenge choreography, GK device path, batched verifier, device MSMs).
The full N=2 bit-exactness suite stays in test_batch_prove.py /
test_batch_verify.py (marked ``slow``).
"""

import hashlib

import pytest

from zkecdsa_tpu import ecdsa
from zkecdsa_tpu.protocol.batch import BatchProver
from zkecdsa_tpu.protocol.batch_verify import BatchVerifier
from zkecdsa_tpu.serde import write_json
from zkecdsa_tpu.utils import rng
from zkecdsa_tpu.zkp_attest_list import (
    SignatureProofList,
    generate_params_list,
    prove_signature_list,
    verify_signature_list,
)


@pytest.fixture(scope="module")
def pipe():
    with rng.deterministic(77):
        params = generate_params_list()
        kp = ecdsa.generate_keypair()
        msg = b"gate"
        sig = ecdsa.sign(kp, msg)
        pub = ecdsa.export_public_raw(kp)
        mh = hashlib.sha256(msg).digest()
        ring = [ecdsa.key_to_int(pub), 11, 13, 17]
    with rng.scoped(rng.DeterministicSource(4242)):
        host_proof = prove_signature_list(params, mh, sig, pub, 0, ring)
    batch_proofs = BatchProver(params).prove(
        [mh], [sig], [pub], [0], ring, [rng.DeterministicSource(4242)]
    )
    return params, mh, ring, host_proof, batch_proofs[0]


def test_batched_prove_bit_exact_vs_host(pipe):
    params, mh, ring, hp, bp = pipe
    assert bp.eq(hp)
    assert write_json(SignatureProofList, bp) == write_json(
        SignatureProofList, hp
    )


def test_batched_proof_accepted_by_host_verifier(pipe):
    params, mh, ring, hp, bp = pipe
    assert verify_signature_list(params, mh, ring, bp)


def test_batched_verifier_accepts_and_rejects(pipe):
    params, mh, ring, hp, bp = pipe
    bv = BatchVerifier(params)
    assert bv.verify([mh], ring, [bp]) == [True]
    bad = hashlib.sha256(b"tampered").digest()
    assert bv.verify([bad], ring, [bp]) == [False]
    assert bv.verify([], ring, []) == []  # empty batch must not crash
