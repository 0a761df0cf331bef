"""Test: does phase_b fault only when fed phase_a's device outputs?
MODE=direct  -> exactly like prove() (expected to fault)
MODE=roundtrip -> phase_a outputs pulled to host numpy first
"""
import os, sys, hashlib, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from zkecdsa_tpu import ecdsa
from zkecdsa_tpu.protocol import batch as B
from zkecdsa_tpu.protocol.batch import BatchProver
from zkecdsa_tpu.utils import rng
from zkecdsa_tpu.zkp_attest_list import generate_params_list

MODE = sys.argv[1] if len(sys.argv) > 1 else "direct"
N = 2
with rng.deterministic(42):
    params = generate_params_list()
    msgs, sigs, pubs, whichs, ring = [], [], [], [], []
    for i in range(N):
        kp = ecdsa.generate_keypair()
        msg = f"m{i}".encode()
        sigs.append(ecdsa.sign(kp, msg))
        pub = ecdsa.export_public_raw(kp)
        msgs.append(hashlib.sha256(msg).digest())
        pubs.append(pub)
        ring.append(ecdsa.key_to_int(pub))
        whichs.append(i)

prover = BatchProver(params)

if MODE == "roundtrip":
    orig_a, orig_b = prover.phase_a, prover.phase_b
    def wrapped_a(*args):
        out = orig_a(*args)
        return jax.tree.map(lambda x: np.asarray(x), out)
    prover.phase_a = wrapped_a
elif MODE == "bwrap":
    orig_b = prover.phase_b
    def wrapped_b(*args):
        args = [np.asarray(x) for x in args]
        return orig_b(*args)
    prover.phase_b = wrapped_b
elif MODE == "save":
    def save_b(*args):
        np.savez("/root/repo/scratch_bargs.npz", *[np.asarray(x) for x in args])
        print("saved phase_b args", flush=True)
        sys.exit(0)
    prover.phase_b = save_b
elif MODE == "ab":
    d = np.load("/root/repo/scratch_bargs.npz")
    bargs = [d[k] for k in d.files]
    orig_b = prover.phase_b
    def wrapped_b(*args):
        t0 = time.perf_counter()
        out = jax.block_until_ready(orig_b(*bargs))
        print(f"ab: phase_b(saved) OK in {time.perf_counter()-t0:.1f}s", flush=True)
        sys.exit(0)
    prover.phase_b = wrapped_b
elif MODE == "anox":
    # compile phase_a (AOT, no execute), then run phase_b on saved args
    d = np.load("/root/repo/scratch_bargs.npz")
    bargs = [d[k] for k in d.files]
    orig_a = prover.phase_a
    def wrapped_a(*args):
        lowered = orig_a.lower(*args)
        compiled = lowered.compile()
        print("anox: phase_a compiled (not executed)", flush=True)
        t0 = time.perf_counter()
        out = jax.block_until_ready(prover.phase_b(*bargs))
        print(f"anox: phase_b OK in {time.perf_counter()-t0:.1f}s", flush=True)
        sys.exit(0)
    prover.phase_a = wrapped_a
elif MODE == "asmall":
    # execute phase_a, then a small mul, then phase_b on saved args
    d = np.load("/root/repo/scratch_bargs.npz")
    bargs = [d[k] for k in d.files]
    orig_a = prover.phase_a
    def wrapped_a(*args):
        out = jax.block_until_ready(orig_a(*args))
        print("asmall: phase_a executed", flush=True)
        from zkecdsa_tpu.ops.limbs import P256_N
        a = jnp.asarray(P256_N.pack([123] * 8))
        r = jax.block_until_ready(jax.jit(P256_N.mul)(a, a))
        print("asmall: small mul OK:", P256_N.unpack(r)[0] == 123 * 123 * pow(P256_N.R, -1, P256_N.p) * P256_N.R % P256_N.p, flush=True)
        t0 = time.perf_counter()
        out2 = jax.block_until_ready(prover.phase_b(*bargs))
        print(f"asmall: phase_b OK in {time.perf_counter()-t0:.1f}s", flush=True)
        sys.exit(0)
    prover.phase_a = wrapped_a
elif MODE == "load":
    d = np.load("/root/repo/scratch_bargs.npz")
    args = [d[k] for k in d.files]
    t0 = time.perf_counter()
    out = jax.block_until_ready(prover.phase_b(*args))
    print(f"load: phase_b OK in {time.perf_counter()-t0:.1f}s", flush=True)
    sys.exit(0)

tapes = [rng.DeterministicSource(100 + i) for i in range(N)]
t0 = time.perf_counter()
proofs = prover.prove(msgs, sigs, pubs, whichs, ring, tapes)
print(f"{MODE}: prove OK in {time.perf_counter()-t0:.1f}s", flush=True)
from zkecdsa_tpu.zkp_attest_list import verify_signature_list
print("verify:", verify_signature_list(params, msgs[0], ring, proofs[0]), flush=True)
