"""Mesh-sharded kernels and pipeline on the virtual 8-device CPU mesh
(conftest forces ``--xla_force_host_platform_device_count=8``).

Fast tests check every building block in zkecdsa_tpu/parallel/mesh.py
against host arithmetic; the ``slow`` test runs the ACTUAL BatchProver /
BatchVerifier dp-sharded across 2 devices and requires bit-identical wire
output vs the unsharded prover (data parallelism must not change a single
byte of a proof).
"""

import hashlib

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from zkecdsa_tpu import ecdsa
from zkecdsa_tpu.curves.instances import tomEdwards256
from zkecdsa_tpu.ops.curve_ops import nibble_digits, tom_ops
from zkecdsa_tpu.ops.f32field import TOM_N
from zkecdsa_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    replicate,
    shard_batch,
    sharded_commit,
    sharded_gk_dvalues,
    sharded_gk_recombine,
    sharded_gk_total,
    sharded_msm,
)
from zkecdsa_tpu.protocol.batch import BatchProver, device_params_for
from zkecdsa_tpu.protocol.batch_verify import BatchVerifier
from zkecdsa_tpu.serde import write_json
from zkecdsa_tpu.utils import rng
from zkecdsa_tpu.zkp_attest_list import (
    SignatureProofList,
    generate_params_list,
)

fo = TOM_N


@pytest.fixture(scope="module")
def params():
    with rng.deterministic(31337):
        return generate_params_list()


def test_shard_batch_requires_divisibility():
    mesh = make_mesh(8)
    x = jnp.zeros((6, 4))
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch(mesh, x)
    y = shard_batch(mesh, jnp.zeros((8, 4)))
    assert y.sharding.spec == jax.sharding.PartitionSpec("dp")
    assert shard_batch(None, x) is x  # mesh-less no-op


def test_replicate_places_every_leaf():
    mesh = make_mesh(8)
    tree = {"a": jnp.ones((3, 2)), "b": np.zeros(5, np.float32)}
    rep = replicate(mesh, tree)
    for leaf in jax.tree.leaves(rep):
        assert len(leaf.sharding.device_set) == 8
    assert replicate(None, tree) is tree


def test_sharded_commit_matches_host(params):
    mesh = make_mesh(8)
    dev = device_params_for(params)
    rs = np.random.RandomState(3)
    B = 8
    vals_i = [int(rs.randint(1, 1 << 60)) for _ in range(B)]
    blinds_i = [int(rs.randint(1, 1 << 60)) for _ in range(B)]
    out = sharded_commit(
        mesh,
        dev,
        shard_batch(mesh, jnp.asarray(fo.pack(vals_i, mont=False))),
        shard_batch(mesh, jnp.asarray(fo.pack(blinds_i, mont=False))),
    )
    got = tom_ops.unpack_points(np.asarray(out))
    pg = params.proof_group
    for pt, v, r in zip(got, vals_i, blinds_i):
        want = pg.g.mul(pg.c.new_scalar(v)).add(pg.h.mul(pg.c.new_scalar(r)))
        assert pt.eq(want)


def test_sharded_gk_total_matches_host():
    mesh = make_mesh(8, axis="ring")
    rs = np.random.RandomState(4)
    RING, n = 8, 3
    f_ints = [int(rs.randint(1, 1 << 50)) for _ in range(RING * n)]
    v_ints = [int(rs.randint(1, 1 << 50)) for _ in range(RING)]
    factors = jnp.asarray(fo.pack(f_ints)).reshape(RING, n, -1)
    vec = jnp.asarray(fo.pack(v_ints))
    total = sharded_gk_total(mesh, factors, vec)
    want = 0
    for i in range(RING):
        prod = 1
        for j in range(n):
            prod = prod * f_ints[i * n + j] % fo.p
        want = (want + v_ints[i] * prod) % fo.p
    assert fo.unpack(np.asarray(total).reshape(1, -1))[0] == want


def test_sharded_msm_matches_host():
    mesh = make_mesh(8, axis="ring")
    rs = np.random.RandomState(5)
    RING = 8
    g = tomEdwards256
    host_pts = [g.generator().mul(g.new_scalar(k + 2)) for k in range(RING)]
    scalars = [int(rs.randint(1, 1 << 40)) for _ in range(RING)]
    out = sharded_msm(
        mesh,
        tom_ops,
        jnp.asarray(tom_ops.pack_points(host_pts)),
        jnp.asarray(nibble_digits(scalars)),
    )
    want = g.identity()
    for pt, s in zip(host_pts, scalars):
        want = want.add(pt.mul(g.new_scalar(s)))
    assert tom_ops.unpack_points(np.asarray(out)[None])[0].eq(want)


def test_sharded_gk_dvalues_matches_device():
    """Ring-sharded d-values (config-5 axis) vs the single-device kernel,
    on the 2D dp x ring mesh - must be bit-exact."""
    from zkecdsa_tpu.protocol.batch_gk import gk_dvalues_device

    mesh = make_mesh_2d(2, 4)
    rs = np.random.RandomState(6)
    N, n, RING = 2, 4, 16
    eli = jnp.asarray(rs.randint(0, 2, (N, n)).astype(np.int32))
    ai = jnp.asarray(
        fo.pack([int(rs.randint(1, 1 << 50)) for _ in range(N * n)])
    ).reshape(N, n, -1)
    vals = jnp.asarray(fo.pack([int(rs.randint(1, 1 << 50)) for _ in range(RING)]))
    vidx = jnp.asarray(fo.pack([int(rs.randint(1, 1 << 50)) for _ in range(N)]))
    want = fo.unpack_canonical(gk_dvalues_device(eli, ai, vals, vidx))
    got = fo.unpack_canonical(
        sharded_gk_dvalues(mesh, eli, ai, vals, vidx, dp_axis="dp")
    )
    assert got == want


def test_sharded_gk_recombine_matches_device():
    from zkecdsa_tpu.protocol.batch_gk import gk_recombine_device

    mesh = make_mesh_2d(2, 4)
    rs = np.random.RandomState(7)
    N, n, RING = 2, 3, 8
    f = jnp.asarray(
        fo.pack([int(rs.randint(1, 1 << 50)) for _ in range(N * n)])
    ).reshape(N, n, -1)
    xf = jnp.asarray(
        fo.pack([int(rs.randint(1, 1 << 50)) for _ in range(N * n)])
    ).reshape(N, n, -1)
    vals = jnp.asarray(fo.pack([int(rs.randint(1, 1 << 50)) for _ in range(RING)]))
    want = fo.unpack_canonical(gk_recombine_device(f, xf, vals))
    got = fo.unpack_canonical(
        sharded_gk_recombine(mesh, f, xf, vals, dp_axis="dp")
    )
    assert got == want


@pytest.mark.slow
def test_sharded_pipeline_bit_exact(params):
    """The REAL pipeline dp-sharded over 2 devices: proofs must be
    byte-identical to the unsharded batched prover under the same tapes,
    and the sharded verifier must accept them (and reject a tamper).

    Runs in a FRESH SUBPROCESS: XLA:CPU crashes compiling this test's
    giant dp-sharded executables late in a long pytest process -
    reproduced solo through three successive workarounds (zstd->zlib,
    cache-write guard, full cache bypass; each moved the crash one frame,
    ending at a segfault inside plain ``backend_compile_and_load``) -
    while fresh processes (this test alone, dryrun_multichip, the
    config-5 rehearsal) compile the same programs reliably.  Process
    isolation is the only workaround that holds; the cache-layer guards
    in utils/cache.py remain because they fix real crashes of their own."""
    import os
    import subprocess
    import sys

    if os.environ.get("ZKECDSA_SHARDED_SUBPROC") != "1":
        # dedicated cache dir: utils/cache.py documents the parent's dir
        # as single-process-only; the parent blocks during run() today,
        # but pytest-xdist-style parallel invocations would reintroduce
        # the corruption window (advisor r4)
        env = dict(
            os.environ,
            ZKECDSA_SHARDED_SUBPROC="1",
            ZKECDSA_CACHE_DIR="/root/repo/.jax_cache_cpu_subproc",
        )
        r = subprocess.run(
            [
                sys.executable, "-m", "pytest", "-q", "-x",
                "-p", "no:cacheprovider",
                __file__ + "::test_sharded_pipeline_bit_exact",
            ],
            env=env,
            capture_output=True,
            text=True,
            timeout=3000,
        )
        assert r.returncode == 0, (
            f"sharded-pipeline subprocess failed rc={r.returncode}\n"
            + r.stdout[-3000:] + r.stderr[-2000:]
        )
        return
    mesh = make_mesh(2)
    with rng.deterministic(99):
        ring = []
        msgs, sigs, pubs, whichs = [], [], [], []
        for i in range(2):
            kp = ecdsa.generate_keypair()
            msg = f"mesh {i}".encode()
            sigs.append(ecdsa.sign(kp, msg))
            pub = ecdsa.export_public_raw(kp)
            msgs.append(hashlib.sha256(msg).digest())
            pubs.append(pub)
            ring.append(ecdsa.key_to_int(pub))
            whichs.append(i)
        ring += [7, 9]

    tapes = lambda: [rng.DeterministicSource(500 + i) for i in range(2)]
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
    bad = hashlib.sha256(b"tamper").digest()
    assert bv.verify([bad, msgs[1]], ring, sharded) == [False, True]
