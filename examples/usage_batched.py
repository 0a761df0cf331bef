"""Batched ZKAttest on the device pipeline.

Proves a batch of independent signatures under one ring in one
phase-structured device pipeline, then verifies the whole batch with the
batched device verifier.  Compare examples/usage.py (scalar host path).
"""

import hashlib
import os
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from zkecdsa_tpu import ecdsa, generate_params_list, key_to_int
from zkecdsa_tpu.protocol import BatchProver, BatchVerifier
from zkecdsa_tpu.serde import write_json
from zkecdsa_tpu.zkp_attest_list import SignatureProofList


def main() -> None:
    B = int(os.environ.get("BATCH", "4"))
    print(f"devices: {jax.devices()}  batch: {B}")

    msgs, sigs, pubs, whichs, ring = [], [], [], [], []
    for i in range(B):
        kp = ecdsa.generate_keypair()
        msg = f"message number {i}".encode()
        sigs.append(ecdsa.sign(kp, msg))
        pub = ecdsa.export_public_raw(kp)
        msgs.append(hashlib.sha256(msg).digest())
        pubs.append(pub)
        ring.append(key_to_int(pub))
        whichs.append(i)
    ring += [4, 5, 6, 7]  # extra decoy keys

    params = generate_params_list()
    prover = BatchProver(params)
    t0 = time.perf_counter()
    proofs = prover.prove(msgs, sigs, pubs, whichs, ring)
    t1 = time.perf_counter()
    print(f"batched prove: {t1 - t0:.2f}s for {B} proofs "
          f"({B / (t1 - t0):.2f} proofs/sec incl. compile)")
    print(f"proof size: {len(write_json(SignatureProofList, proofs[0]))} bytes")

    t0 = time.perf_counter()
    oks = BatchVerifier(params).verify(msgs, ring, proofs)
    t1 = time.perf_counter()
    print(f"batched verify: {t1 - t0:.2f}s -> {oks}")
    assert all(oks)


if __name__ == "__main__":
    main()
