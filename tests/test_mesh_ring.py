"""Config-5 shape inside the committed suite (VERDICT r4 next #6): the
REAL BatchProver/BatchVerifier on a 2x4 dp x ring mesh with the ring
axis actually engaged at ring 2^10, wire-bit-exact vs the unsharded
pipeline.  Previously the only ring-axis evidence beyond ring 8 lived in
tools/config5_rehearsal.py, outside pytest.

Subprocess-isolated for the same reason as
tests/test_mesh.py::test_sharded_pipeline_bit_exact: XLA:CPU segfaults
compiling the giant multi-device executables late in a long pytest
process, while fresh processes compile them reliably.  Shares that
test's dedicated cache-dir convention (single-process-only dirs).
"""

import hashlib

import pytest

from zkecdsa_tpu import ecdsa
from zkecdsa_tpu.serde import write_json
from zkecdsa_tpu.utils import rng
from zkecdsa_tpu.zkp_attest_list import SignatureProofList, generate_params_list

RING_SIZE = 1 << 10


@pytest.mark.slow
def test_ring_sharded_prove_verify_bit_exact():
    import os
    import subprocess
    import sys

    if os.environ.get("ZKECDSA_RING_SUBPROC") != "1":
        env = dict(
            os.environ,
            ZKECDSA_RING_SUBPROC="1",
            ZKECDSA_CACHE_DIR="/root/repo/.jax_cache_cpu_subproc",
        )
        r = subprocess.run(
            [
                sys.executable, "-m", "pytest", "-q", "-x",
                "-p", "no:cacheprovider",
                __file__ + "::test_ring_sharded_prove_verify_bit_exact",
            ],
            env=env,
            capture_output=True,
            text=True,
            timeout=5400,
        )
        assert r.returncode == 0, (
            f"ring-sharded subprocess failed rc={r.returncode}\n"
            + r.stdout[-3000:] + r.stderr[-2000:]
        )
        return

    from zkecdsa_tpu.parallel.mesh import make_mesh_2d
    from zkecdsa_tpu.protocol.batch import BatchProver
    from zkecdsa_tpu.protocol.batch_gk import _ring_sharded
    from zkecdsa_tpu.protocol.batch_verify import BatchVerifier

    mesh = make_mesh_2d(2, 4)
    assert _ring_sharded(mesh, RING_SIZE), "ring axis must engage"

    with rng.deterministic(77):
        params = generate_params_list()
        msgs, sigs, pubs, whichs, ring = [], [], [], [], []
        for i in range(2):
            kp = ecdsa.generate_keypair()
            msg = f"ring-mesh {i}".encode()
            sigs.append(ecdsa.sign(kp, msg))
            pub = ecdsa.export_public_raw(kp)
            msgs.append(hashlib.sha256(msg).digest())
            pubs.append(pub)
            ring.append(ecdsa.key_to_int(pub))
            whichs.append(i)
        ring += [10_000 + i for i in range(RING_SIZE - 2)]

    tapes = lambda: [rng.DeterministicSource(900 + i) for i in range(2)]  # noqa: E731
    base = BatchProver(params).prove(msgs, sigs, pubs, whichs, ring, tapes())
    sharded = BatchProver(params, mesh=mesh).prove(
        msgs, sigs, pubs, whichs, ring, tapes()
    )
    for b, s in zip(base, sharded):
        assert write_json(SignatureProofList, s) == write_json(
            SignatureProofList, b
        )
    bv = BatchVerifier(params, mesh=mesh)
    assert bv.verify(msgs, ring, sharded) == [True, True]
    # tamper 1: wrong message fails only that instance
    bad = hashlib.sha256(b"tamper").digest()
    assert bv.verify([bad, msgs[1]], ring, sharded) == [False, True]
    # tamper 2: changing ANY ring entry breaks the GK d-polynomial
    # cancellation for EVERY proof over that ring (the low-degree
    # coefficients of sum_i prod_i(x)(com - g*v_i) no longer match the
    # committed cd terms), so both instances fail
    bad_ring = ring[:1] + [5] + ring[2:]
    assert bv.verify(msgs, bad_ring, sharded) == [False, False]
