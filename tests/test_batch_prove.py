"""Batched prover vs host prover: bit-exact wire equality under identical
per-instance random tapes (the correctness contract for configs 2/4)."""

import hashlib

import pytest

pytestmark = pytest.mark.slow  # full batched prove: ~10 min on a 2-core CPU box

from zkecdsa_tpu import ecdsa
from zkecdsa_tpu.protocol.batch import BatchProver
from zkecdsa_tpu.serde import write_json
from zkecdsa_tpu.utils import rng
from zkecdsa_tpu.zkp_attest_list import (
    SignatureProofList,
    generate_params_list,
    prove_signature_list,
    verify_signature_list,
)

N = 2


@pytest.fixture(scope="module")
def setup():
    with rng.deterministic(123):
        params = generate_params_list()
        msgs, sigs, pubs, whichs, ring = [], [], [], [], []
        for i in range(N):
            kp = ecdsa.generate_keypair()
            msg = f"message {i}".encode()
            sigs.append(ecdsa.sign(kp, msg))
            pub = ecdsa.export_public_raw(kp)
            msgs.append(hashlib.sha256(msg).digest())
            pubs.append(pub)
            ring.append(ecdsa.key_to_int(pub))
            whichs.append(i)
        ring += [101, 103]
    host_proofs = []
    for i in range(N):
        with rng.scoped(rng.DeterministicSource(1000 + i)):
            host_proofs.append(
                prove_signature_list(
                    params, msgs[i], sigs[i], pubs[i], whichs[i], ring
                )
            )
    tapes = [rng.DeterministicSource(1000 + i) for i in range(N)]
    batch_proofs = BatchProver(params).prove(
        msgs, sigs, pubs, whichs, ring, tapes
    )
    return params, msgs, ring, host_proofs, batch_proofs


def test_batched_prover_bit_exact(setup):
    params, msgs, ring, host_proofs, batch_proofs = setup
    for hp, bp in zip(host_proofs, batch_proofs):
        assert bp.eq(hp)
        assert write_json(SignatureProofList, bp) == write_json(
            SignatureProofList, hp
        )


def test_batched_proofs_verify(setup):
    params, msgs, ring, host_proofs, batch_proofs = setup
    for i, bp in enumerate(batch_proofs):
        assert verify_signature_list(params, msgs[i], ring, bp)


def test_batched_proof_bound_to_instance(setup):
    params, msgs, ring, host_proofs, batch_proofs = setup
    # proof for instance 0 must not verify for instance 1's message
    assert not verify_signature_list(params, msgs[1], ring, batch_proofs[0])


@pytest.mark.slow
def test_chunked_prove_bit_identical():
    """N > MAX_CHUNK chunks transparently and stays bit-identical to the
    unchunked prover under the same tapes (config-4 batch sizes rely on
    this: the comb4 tables bound one dispatch at ~256 instances)."""
    import hashlib

    from zkecdsa_tpu import ecdsa
    from zkecdsa_tpu.protocol.batch import BatchProver
    from zkecdsa_tpu.serde import write_json
    from zkecdsa_tpu.zkp_attest_list import SignatureProofList

    with rng.deterministic(41):
        params = generate_params_list()
        msgs, sigs, pubs, whichs, ring = [], [], [], [], []
        for i in range(2):
            kp = ecdsa.generate_keypair()
            msg = f"chunk {i}".encode()
            sigs.append(ecdsa.sign(kp, msg))
            pub = ecdsa.export_public_raw(kp)
            msgs.append(hashlib.sha256(msg).digest())
            pubs.append(pub)
            ring.append(ecdsa.key_to_int(pub))
            whichs.append(i)
        ring += [23, 29]

    tapes = lambda: [rng.DeterministicSource(600 + i) for i in range(2)]  # noqa: E731
    base = BatchProver(params).prove(msgs, sigs, pubs, whichs, ring, tapes())
    chunked_prover = BatchProver(params)
    chunked_prover.MAX_CHUNK = 1
    chunked = chunked_prover.prove(msgs, sigs, pubs, whichs, ring, tapes())
    for b, s in zip(base, chunked):
        assert write_json(SignatureProofList, s) == write_json(
            SignatureProofList, b
        )
