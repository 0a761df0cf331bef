"""Benchmark entry point (driver contract: prints ONE JSON line).

Measures batched ZKAttest proving throughput on whatever jax.devices()
provides (the real TPU chip under the driver; CPU if forced).  The
baseline is this repo's host scalar prover - the stand-in for the
reference TypeScript implementation (same algorithm class: sequential
CPU bignum; the reference repo publishes no numbers and Node.js is not
available here, see BASELINE.md).

Env knobs: BENCH_BATCH (default 16), BENCH_RING (default 8),
BENCH_HOST_REPS (default 1).
"""

import json
import os
import sys
import time


def main() -> None:
    import hashlib

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from zkecdsa_tpu import ecdsa
    from zkecdsa_tpu.protocol.batch import BatchProver
    from zkecdsa_tpu.utils import rng
    from zkecdsa_tpu.zkp_attest_list import (
        generate_params_list,
        prove_signature_list,
        verify_signature_list,
    )

    B = int(os.environ.get("BENCH_BATCH", "16"))
    RING = int(os.environ.get("BENCH_RING", "8"))
    HOST_REPS = int(os.environ.get("BENCH_HOST_REPS", "1"))

    with rng.deterministic(42):
        params = generate_params_list()
        msgs, sigs, pubs, whichs, ring = [], [], [], [], []
        for i in range(B):
            kp = ecdsa.generate_keypair()
            msg = f"bench message {i}".encode()
            sigs.append(ecdsa.sign(kp, msg))
            pub = ecdsa.export_public_raw(kp)
            msgs.append(hashlib.sha256(msg).digest())
            pubs.append(pub)
            ring.append(ecdsa.key_to_int(pub) if i < RING else 0)
            whichs.append(i % RING)
        ring = ring[:RING] + list(range(1000, 1000 + max(0, RING - B)))
        ring = ring[:RING]
        whichs = [w % RING for w in whichs]

    # baseline: host scalar prover (reference-class CPU implementation)
    t0 = time.perf_counter()
    for i in range(HOST_REPS):
        with rng.deterministic(7 + i):
            prove_signature_list(
                params, msgs[i % B], sigs[i % B], pubs[i % B], whichs[i % B], ring
            )
    host_per_proof = (time.perf_counter() - t0) / HOST_REPS
    print(f"# host scalar prover: {host_per_proof:.2f} s/proof", file=sys.stderr)

    prover = BatchProver(params)

    def run(seed_base):
        tapes = [rng.DeterministicSource(seed_base + i) for i in range(B)]
        return prover.prove(msgs, sigs, pubs, whichs, ring, tapes)

    # warm-up: compile everything
    t0 = time.perf_counter()
    proofs = run(10_000)
    warm = time.perf_counter() - t0
    print(f"# warm-up (incl compile): {warm:.1f} s", file=sys.stderr)
    assert verify_signature_list(params, msgs[0], ring, proofs[0]), "bench proof invalid"

    t0 = time.perf_counter()
    run(20_000)
    elapsed = time.perf_counter() - t0
    throughput = B / elapsed
    print(f"# batched prove: {elapsed:.2f} s for {B} proofs", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "zkattest_prove_throughput",
                "value": round(throughput, 4),
                "unit": "proofs/sec",
                "vs_baseline": round(throughput * host_per_proof, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
