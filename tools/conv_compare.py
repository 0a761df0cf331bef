"""Interleaved same-process comparison of the digit-conv implementations
(f32field._CONV_IMPL): fmul chain + Edwards add chain per impl, two
passes, so host-load drift between runs cannot masquerade as a kernel
difference (the subprocess-per-impl runs disagreed by ~18% run to run).

Usage: python tools/conv_compare.py [rows_log2=15]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zkecdsa_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

    from zkecdsa_tpu.ops import f32field as F
    from zkecdsa_tpu.ops.curve_ops import EdwardsOps
    from zkecdsa_tpu.curves.instances import tomEdwards256

    rows = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 15)
    impls = ("matmul", "bf16", "reshape")

    fns = {}
    ref_out = {}
    for impl in impls:
        F._CONV_IMPL = impl
        rs = np.random.RandomState(0)  # identical inputs per impl
        # fresh field/ops instances so nothing reuses a stale jit cache
        fo = F.F32Field("tom.n", F.TOM_N.p)
        ops = EdwardsOps(
            F.F32Field("tom.p", F.TOM_P.p), tomEdwards256.a, tomEdwards256.d,
            tomEdwards256,
        )
        vals = [int.from_bytes(rs.bytes(40), "big") % fo.p for _ in range(rows)]
        a = jnp.asarray(fo.pack(vals))

        def mul_chain(x, fo=fo):
            def step(acc, _):
                return fo.mul(acc, x), None

            acc, _ = jax.lax.scan(step, x, None, length=64)
            return acc

        pts = ops.pack_points(
            [tomEdwards256.generator().mul(tomEdwards256.new_scalar(k + 2))
             for k in range(64)]
        )
        P = jnp.asarray(np.tile(pts, (rows // 64, 1, 1)))

        def add_chain(P0, ops=ops):
            def step(acc, _):
                return ops.add(acc, P0), None

            acc, _ = jax.lax.scan(step, P0, None, length=64)
            return acc

        jm = jax.jit(mul_chain)
        ja = jax.jit(add_chain)
        jax.block_until_ready(jm(a))  # trace+compile under this impl
        jax.block_until_ready(ja(P))
        fns[impl] = (jm, a, ja, P)
        ref_out[impl] = fo.unpack(jm(a))
    for other in impls[1:]:
        assert ref_out[other] == ref_out[impls[0]], f"{other} disagrees"
    print("all impls agree (canonical ints)")

    # interleave timing, two passes
    for rnd in range(2):
        for impl in impls:
            jm, a, ja, P = fns[impl]
            t0 = time.perf_counter()
            for _ in range(3):
                jax.block_until_ready(jm(a))
            tm = (time.perf_counter() - t0) / 3
            t0 = time.perf_counter()
            for _ in range(3):
                jax.block_until_ready(ja(P))
            ta = (time.perf_counter() - t0) / 3
            print(
                f"pass{rnd} {impl:<8} fmul {tm * 1e9 / (rows * 64):7.1f} "
                f"ns/el  add {ta * 1e9 / (rows * 64):7.1f} ns/el",
                flush=True,
            )


if __name__ == "__main__":
    main()
