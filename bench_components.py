"""Per-component benchmark suite, mirroring the reference's bench/ harness
(reference bench/curves/ec.bench.ts:34-53, bench/exp/exp.bench.ts:43-59,
bench/proofGK/gk.bench.ts:31-47, bench/commit/*.bench.ts,
bench/zkpAttestList.bench.ts:46 proof-size printouts, bench/hrtime.ts).

Prints one line per component: name, ns/op (or ops/sec), and for proofs the
JSON wire size.  Device kernels run on whatever jax.devices() provides (the
real TPU chip under the driver; CPU if JAX_PLATFORMS=cpu).

Env knobs: CB_DEVICE_BATCH (default 4096) - the batch amortizing device
dispatch; CB_RINGS (default "8,1024") - GK ring sizes; CB_FAST=1 skips the
host prove/verify end-to-end rows (minutes on CPU).
"""

import hashlib
import json
import os
import sys
import time


def timeit(fn, reps, *args):
    fn(*args)  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    dt = (time.perf_counter() - t0) / reps
    return out, dt


def row(name, ns_per_op, extra=""):
    ops = 1e9 / ns_per_op if ns_per_op else 0.0
    print(f"{name:<38} {ns_per_op:>14,.0f} ns/op {ops:>14,.1f} ops/s  {extra}")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zkecdsa_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

    from zkecdsa_tpu import ecdsa
    from zkecdsa_tpu.bignum import big
    from zkecdsa_tpu.curves.instances import ALL_GROUPS, p256, tomEdwards256
    from zkecdsa_tpu.ops.curve_ops import nibble_digits, p256_ops, tom_ops, war_ops
    from zkecdsa_tpu.ops.f32field import P256_P, TOM_N
    from zkecdsa_tpu.proofGK.gk import prove_membership, verify_membership
    from zkecdsa_tpu.commit.pedersen import generate_pedersen_params
    from zkecdsa_tpu.serde import read_json, write_json
    from zkecdsa_tpu.utils import rng
    from zkecdsa_tpu.zkp_attest_list import (
        SignatureProofList,
        generate_params_list,
        prove_signature_list,
        verify_signature_list,
    )

    B = int(os.environ.get("CB_DEVICE_BATCH", "4096"))
    rings = [int(r) for r in os.environ.get("CB_RINGS", "8,1024").split(",")]
    fast = os.environ.get("CB_FAST", "") == "1"
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} ({dev})   batch {B}")
    rs = np.random.RandomState(7)

    # ---- field engine (bignum analog of bench/bignum/big.bench.ts) ----
    f = P256_P
    a = jnp.asarray(f.pack([int.from_bytes(rs.bytes(31), "big") for _ in range(B)]))
    b = jnp.asarray(f.pack([int.from_bytes(rs.bytes(31), "big") for _ in range(B)]))
    mulf = jax.jit(f.mul)
    _, dt = timeit(lambda: jax.block_until_ready(mulf(a, b)), 20)
    row("field/mulmod-256 (batched)", dt * 1e9 / B)
    invf = jax.jit(f.batch_inv)
    _, dt = timeit(lambda: jax.block_until_ready(invf(a)), 5)
    row("field/batch_inv", dt * 1e9 / B)

    # ---- curve kernels (ec.bench.ts:34-53 / hrtime.ts analog) ----
    host_mul_ns = {}
    for g, ops in ((p256, p256_ops), (tomEdwards256, tom_ops)):
        G = g.generator()
        pts = [G.mul(g.new_scalar(k + 2)) for k in range(64)]
        packed = ops.pack_points((pts * ((B // 64) + 1))[:B])
        P = jnp.asarray(packed)
        Q = jnp.asarray(np.roll(packed, 7, axis=0))  # host roll, no device round-trip
        _, dt = timeit(lambda: jax.block_until_ready(ops.add(P, Q)), 20)
        row(f"{g.name}/ec/add (batched)", dt * 1e9 / B)
        _, dt = timeit(lambda: jax.block_until_ready(ops.dbl(P)), 20)
        row(f"{g.name}/ec/dbl (batched)", dt * 1e9 / B)
        SB = max(B // 16, 1)
        digs = jnp.asarray(
            nibble_digits([int.from_bytes(rs.bytes(32), "big") for _ in range(SB)])
        )
        Ps = P[:SB]
        _, dt = timeit(lambda: jax.block_until_ready(ops.scalar_mul(Ps, digs)), 3)
        row(f"{g.name}/ec/mul (batched)", dt * 1e9 / SB)
        # host scalar mul (the reference's actual op shape, hrtime.ts)
        s = g.new_scalar(int.from_bytes(rs.bytes(32), "big"))
        _, dt = timeit(lambda: G.mul(s), 20)
        host_mul_ns[g.name] = dt * 1e9
        row(f"{g.name}/ec/mul (host scalar)", dt * 1e9)

    # ---- MSM backends (multimult.ts:61-145 replacement): Straus
    # shared-window vs Pippenger buckets (VERDICT r2 item 7) ----
    g = tomEdwards256
    G = g.generator()
    for T in (64, 512, 4096):
        pts = [G.mul(g.new_scalar(k + 2)) for k in range(T)]
        scs = [int.from_bytes(rs.bytes(32), "big") for _ in range(T)]
        P = jnp.asarray(tom_ops.pack_points(pts))
        if T <= 512:  # the Straus window table is [T,16,C,L] HBM
            D = jnp.asarray(nibble_digits(scs))
            _, dt = timeit(
                lambda: jax.block_until_ready(tom_ops.msm_shared(P, D)), 3
            )
            row(f"msm_shared T={T}", dt * 1e9 / T, f"({dt*1e3:.1f} ms/msm)")
        _, dt = timeit(
            lambda: jax.block_until_ready(tom_ops.msm_pippenger(P, scs)), 3
        )
        row(f"msm_pippenger T={T}", dt * 1e9 / T, f"({dt*1e3:.1f} ms/msm)")

    # ---- Pedersen commit (pedersen.bench.ts:26-28) ----
    with rng.deterministic(3):
        pp = generate_pedersen_params(tomEdwards256)
    from zkecdsa_tpu.protocol.batch import device_params_for

    with rng.deterministic(4):
        params = generate_params_list()
    dp = device_params_for(params)
    vals = jnp.asarray(TOM_N.pack([int.from_bytes(rs.bytes(31), "big") for _ in range(B)]))
    blinds = jnp.asarray(TOM_N.pack([int.from_bytes(rs.bytes(31), "big") for _ in range(B)]))
    cfn = jax.jit(lambda v, r: dp.commit_tom(v, r, v_canon=True))
    _, dt = timeit(lambda: jax.block_until_ready(cfn(vals, blinds)), 5)
    row("pedersen/commit (batched device)", dt * 1e9 / B)
    _, dt = timeit(lambda: pp.commit(12345), 10)
    row("pedersen/commit (host scalar)", dt * 1e9)

    # ---- GK membership by ring size (gk.bench.ts:31-47) ----
    for R in rings:
        keys = [3 + 2 * i for i in range(R)]
        with rng.deterministic(5):
            com = pp.commit(keys[1])
            gkp, dt = timeit(
                lambda: prove_membership(pp, com, 1, keys), 1
            )
        row(f"gk/prove ring={R} (host)", dt * 1e9)
        _, dt = timeit(lambda: verify_membership(pp, com.p, keys, gkp), 1)
        row(f"gk/verify ring={R} (host)", dt * 1e9)

    # ---- device GK kernels by ring size (config 3: the d-polynomial
    # evaluation and ring recombination on-chip; gk.ts:135-171, 239-250) ----
    from zkecdsa_tpu.protocol.batch_gk import (
        gk_dvalues_device,
        gk_recombine_device,
    )

    NGK = int(os.environ.get("CB_GK_BATCH", "64"))
    for R in rings:
        RING = 1 << max(1, (R - 1).bit_length())
        n = (RING - 1).bit_length()
        if n == 0:
            continue
        vals = jnp.asarray(
            TOM_N.pack([3 + 2 * i for i in range(RING)], mont=False)
        )
        eli = jnp.asarray(np.random.RandomState(8).randint(0, 2, (NGK, n)), jnp.int32)
        ai = jnp.asarray(
            TOM_N.pack(
                [int.from_bytes(rs.bytes(31), "big") for _ in range(NGK * n)]
            )
        ).reshape(NGK, n, -1)
        vidx = jnp.asarray(
            TOM_N.pack([int.from_bytes(rs.bytes(31), "big") for _ in range(NGK)])
        )
        f_a = jnp.asarray(
            TOM_N.pack(
                [int.from_bytes(rs.bytes(31), "big") for _ in range(NGK * n)]
            )
        ).reshape(NGK, n, -1)
        _, dt = timeit(
            lambda: jax.block_until_ready(gk_dvalues_device(eli, ai, vals, vidx)),
            3,
        )
        row(
            f"gk/dvalues ring={RING} batch={NGK} (device)",
            dt * 1e9 / NGK,
            f"({dt*1e3:.1f} ms/batch)",
        )
        _, dt = timeit(
            lambda: jax.block_until_ready(gk_recombine_device(f_a, f_a, vals)),
            3,
        )
        row(
            f"gk/recombine ring={RING} batch={NGK} (device)",
            dt * 1e9 / NGK,
            f"({dt*1e3:.1f} ms/batch)",
        )

    if not fast:
        # ---- end-to-end + serde + sizes (zkpAttestList.bench.ts) ----
        with rng.deterministic(6):
            kp = ecdsa.generate_keypair()
            msg = b"component bench"
            sig = ecdsa.sign(kp, msg)
            pub = ecdsa.export_public_raw(kp)
            mh = hashlib.sha256(msg).digest()
            ring = [ecdsa.key_to_int(pub)] + [5 + i for i in range(7)]
        proof, dt = timeit(
            lambda: prove_signature_list(params, mh, sig, pub, 0, ring), 1
        )
        row("zkattest/prove (host scalar)", dt * 1e9)
        _, dt = timeit(
            lambda: verify_signature_list(params, mh, ring, proof), 1
        )
        row("zkattest/verify (host scalar)", dt * 1e9)
        js, dt = timeit(lambda: write_json(SignatureProofList, proof), 5)
        row("zkattest/toJson", dt * 1e9, f"proof size {len(js)} bytes")
        _, dt = timeit(lambda: read_json(SignatureProofList, js), 5)
        row("zkattest/fromJson", dt * 1e9)

    # ---- bignum host (big.bench.ts:22-26) ----
    from zkecdsa_tpu.curves.instances import war256

    _, dt = timeit(lambda: big.is_prime(war256.p), 5)
    row("big/isPrime (war256 modulus)", dt * 1e9)


if __name__ == "__main__":
    main()
