"""Batched GK membership proofs: device d-values/recombination vs host."""

import pytest

from zkecdsa_tpu.commit import generate_pedersen_params
from zkecdsa_tpu.curves import tomEdwards256
from zkecdsa_tpu.proofGK import prove_membership
from zkecdsa_tpu.proofGK.gk import GKProof
from zkecdsa_tpu.protocol.batch_gk import (
    batch_prove_membership,
    batch_verify_membership,
)
from zkecdsa_tpu.serde import write_json
from zkecdsa_tpu.utils import rng


@pytest.fixture(scope="module")
def setup():
    with rng.deterministic(11):
        params = generate_pedersen_params(tomEdwards256)
    ring = [3, 5, 7, 11, 13]  # pads to 8
    idxs = [1, 3]
    with rng.deterministic(12):
        coms = [params.commit(ring[i]) for i in idxs]
    return params, ring, idxs, coms


def test_batched_gk_bit_identical(setup):
    params, ring, idxs, coms = setup
    host = []
    for i in range(2):
        with rng.scoped(rng.DeterministicSource(500 + i)):
            host.append(prove_membership(params, coms[i], idxs[i], ring))
    tapes = [rng.DeterministicSource(500 + i) for i in range(2)]
    batch = batch_prove_membership(params, coms, idxs, ring, tapes)
    for hp, bp in zip(host, batch):
        assert write_json(GKProof, bp) == write_json(GKProof, hp)
    assert batch_verify_membership(
        params, [c.p for c in coms], ring, batch
    ) == [True, True]


def test_batched_gk_rejects_wrong_commitment(setup):
    params, ring, idxs, coms = setup
    tapes = [rng.DeterministicSource(600 + i) for i in range(2)]
    batch = batch_prove_membership(params, coms, idxs, ring, tapes)
    bad = [params.commit(999).p for _ in range(2)]
    assert batch_verify_membership(params, bad, ring, batch) == [False, False]


def test_batched_gk_rejects_truncated(setup):
    params, ring, idxs, coms = setup
    tapes = [rng.DeterministicSource(700)]
    batch = batch_prove_membership(params, coms[:1], idxs[:1], ring, tapes)
    batch[0].cl = batch[0].cl[:-1]
    assert batch_verify_membership(
        params, [coms[0].p], ring, batch
    ) == [False]
