"""Benchmark entry point (driver contract: prints ONE JSON line).

Measures batched ZKAttest prove+verify throughput (the BASELINE.md north
star metric) on whatever jax.devices() provides (the real TPU chip under
the driver; CPU if forced).  The baseline is this repo's host scalar
prover+verifier - the stand-in for the reference TypeScript implementation
(same algorithm class: sequential CPU bignum; the reference repo publishes
no numbers and Node.js is not available here, see BASELINE.md).

Env knobs: BENCH_BATCH (default 256), BENCH_RING (default 4096 - the
BASELINE config-4 shape; the nightly number tracks the mission scale,
VERDICT r3 weak #9), BENCH_HOST_REPS (default 1), BENCH_PROVE_ONLY=1 to
skip the batched verifier (for quick runs while compile caches are cold),
BENCH_WARMUP=1 for the concurrent AOT phase compile.
"""

import json
import os
import sys
import time


def main() -> None:
    import hashlib

    from zkecdsa_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(os.path.join(os.path.dirname(__file__), ".jax_cache"))
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # sitecustomize imports jax at interpreter boot, freezing the
        # platform before env vars are read - force it via the config API
        # so the documented CPU knob actually works (tests/conftest.py)
        import jax

        jax.config.update("jax_platforms", "cpu")

    from zkecdsa_tpu import ecdsa
    from zkecdsa_tpu.protocol.batch import BatchProver
    from zkecdsa_tpu.protocol.batch_verify import BatchVerifier
    from zkecdsa_tpu.utils import rng
    from zkecdsa_tpu.zkp_attest_list import (
        generate_params_list,
        prove_signature_list,
        verify_signature_list,
    )

    B = int(os.environ.get("BENCH_BATCH", "256"))
    RING = int(os.environ.get("BENCH_RING", "4096"))
    HOST_REPS = int(os.environ.get("BENCH_HOST_REPS", "1"))
    PROVE_ONLY = os.environ.get("BENCH_PROVE_ONLY", "") == "1"

    with rng.deterministic(42):
        params = generate_params_list()
        # RING keypairs; instance i signs under keypair i % RING so every
        # proof's ring slot (whichs[i]) really holds its signer's key - a
        # fresh key per instance with whichs = i % RING made proofs beyond
        # the first RING genuinely invalid (wrong ring member), which the
        # verifier rightly rejected.
        kps = [ecdsa.generate_keypair() for _ in range(min(B, RING))]
        ring = [
            ecdsa.key_to_int(ecdsa.export_public_raw(kp)) for kp in kps
        ] + list(range(1000, 1000 + max(0, RING - B)))
        msgs, sigs, pubs, whichs = [], [], [], []
        for i in range(B):
            kp = kps[i % len(kps)]
            msg = f"bench message {i}".encode()
            sigs.append(ecdsa.sign(kp, msg))
            pubs.append(ecdsa.export_public_raw(kp))
            msgs.append(hashlib.sha256(msg).digest())
            whichs.append(i % len(kps))

    # baseline: host scalar prover + verifier (reference-class CPU impl)
    t0 = time.perf_counter()
    for i in range(HOST_REPS):
        with rng.deterministic(7 + i):
            host_proof = prove_signature_list(
                params, msgs[i % B], sigs[i % B], pubs[i % B], whichs[i % B], ring
            )
    host_prove = (time.perf_counter() - t0) / HOST_REPS
    t0 = time.perf_counter()
    for i in range(HOST_REPS):
        assert verify_signature_list(params, msgs[(HOST_REPS - 1) % B], ring, host_proof)
    host_verify = (time.perf_counter() - t0) / HOST_REPS
    host_per_op = host_prove + (0.0 if PROVE_ONLY else host_verify)
    print(
        f"# host scalar: prove {host_prove:.2f} s, verify {host_verify:.2f} s",
        file=sys.stderr,
    )

    prover = BatchProver(params)
    verifier = None if PROVE_ONLY else BatchVerifier(params)

    def run(seed_base):
        tapes = [rng.DeterministicSource(seed_base + i) for i in range(B)]
        return prover.prove(msgs, sigs, pubs, whichs, ring, tapes)

    # warm-up: compile everything.  The phase programs compile on
    # concurrent threads first (BatchProver.warmup); the prove that
    # follows then hits the persistent compilation cache.
    # BENCH_WARMUP=1 opts into the concurrent AOT phase compile
    # (BatchProver.warmup).  Default OFF here: concurrent compile RPCs
    # through the tunneled single-chip backend hang (observed round 4);
    # on a real multi-controller TPU host the warmup is the right path.
    t0 = time.perf_counter()
    if os.environ.get("BENCH_WARMUP", "0") == "1":
        try:
            prover.warmup(B)
            print(f"# parallel phase compile: {time.perf_counter() - t0:.1f} s", file=sys.stderr)
        except Exception as exc:  # warmup is an optimization, never a gate
            print(f"# parallel warmup failed ({exc!r}); falling back", file=sys.stderr)
    proofs = run(10_000)
    print(f"# prove warm-up (incl compile): {time.perf_counter() - t0:.1f} s", file=sys.stderr)
    if verifier is not None:
        t0 = time.perf_counter()
        ok = verifier.verify(msgs, ring, proofs)
        print(f"# verify warm-up (incl compile): {time.perf_counter() - t0:.1f} s", file=sys.stderr)
        assert all(ok), f"batched verify failed on warm-up: {ok}"
    else:
        assert verify_signature_list(params, msgs[0], ring, proofs[0]), "bench proof invalid"

    timer = None
    if os.environ.get("BENCH_STAGES", "") == "1":
        from zkecdsa_tpu.utils.profiling import StageTimer

        timer = StageTimer()

    # timed reps: the headline is the MEDIAN of >= 2 measured reps, so the
    # committed number is what the driver reproduces rather than the best
    # observed run (~10% run-to-run swing through the dev tunnel,
    # VERDICT r4 weak #2).  Reps REUSE the warm-up tapes: tapes determine
    # the batch's even-round count and thus which quantized phase-B shape
    # bucket compiles - fresh per-rep tapes made a timed rep pay a
    # one-time cache load of the other bucket (75 s vs 27 s steady state)
    REPS = max(2, int(os.environ.get("BENCH_REPS", "3")))
    walls = []
    for rep in range(REPS):
        t0 = time.perf_counter()
        tapes = [rng.DeterministicSource(10_000 + i) for i in range(B)]
        proofs = prover.prove(msgs, sigs, pubs, whichs, ring, tapes, timer=timer)
        t_prove = time.perf_counter() - t0
        print(f"# batched prove: {t_prove:.2f} s for {B} proofs", file=sys.stderr)
        t_verify = 0.0
        if verifier is not None:
            t0 = time.perf_counter()
            ok = verifier.verify(msgs, ring, proofs, timer=timer)
            t_verify = time.perf_counter() - t0
            assert all(ok), f"batched verify failed: {ok}"
            print(f"# batched verify: {t_verify:.2f} s for {B} proofs", file=sys.stderr)
        walls.append(t_prove + t_verify)
    if timer is not None:
        print(timer.report(), file=sys.stderr)
    walls.sort()
    median_wall = walls[len(walls) // 2] if REPS % 2 else (
        walls[REPS // 2 - 1] + walls[REPS // 2]
    ) / 2

    throughput = B / median_wall
    print(
        json.dumps(
            {
                "metric": "zkattest_prove_verify_throughput"
                if not PROVE_ONLY
                else "zkattest_prove_throughput",
                "value": round(throughput, 4),
                "unit": "proofs/sec",
                "vs_baseline": round(throughput * host_per_op, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
