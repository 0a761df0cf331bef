"""Straus (msm_shared) vs bucket (msm_pippenger_rows) crossover on the
current jax backend (run on the chip; CPU works for smoke tests).

Decides Config.pippenger_min_t (the batch verifier's MSM backend dispatch,
protocol/batch_verify.py) with data, per VERDICT r3 item 4.  Replaces the
reference's Bos-Coster heap benchmark scenario
(reference bench/curves/ec.bench.ts, src/curves/multimult.ts:61-145).

Usage: python tools/msm_crossover.py [N_rows] [T ...]
Prints one line per (T, backend): wall ms/row after warm-up, plus an
equality check of both backends against each other.
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

    from zkecdsa_tpu.curves.instances import tomEdwards256
    from zkecdsa_tpu.ops.curve_ops import nibble_digits, tom_ops

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    Ts = [int(t) for t in sys.argv[2:]] or [256, 1024, 4096]
    g = tomEdwards256
    rs = np.random.RandomState(0)

    # a pool of distinct points, tiled to T (content does not affect timing)
    pool = [g.generator().mul(g.new_scalar(int(k) + 2)) for k in range(64)]
    pool_arr = tom_ops.pack_points(pool)  # [64, C, L]

    for T in Ts:
        reps = max(1, 64 // 16)
        pts = np.tile(pool_arr, (N * ((T + 63) // 64), 1, 1))[: N * T]
        arr = jnp.asarray(pts).reshape(N, T, 4, tom_ops.f.nlimbs)
        scal = [
            [int.from_bytes(rs.bytes(32), "big") % g.order for _ in range(T)]
            for _ in range(N)
        ]
        digits = jnp.asarray(
            nibble_digits([s for row in scal for s in row]).reshape(N, T, 64)
        )

        def run_straus():
            return jax.block_until_ready(tom_ops.msm_shared(arr, digits))

        def run_pip():
            return jax.block_until_ready(tom_ops.msm_pippenger_rows(arr, scal))

        out = {}
        for name, fn in (("straus", run_straus), ("bucket", run_pip)):
            t0 = time.perf_counter()
            r = fn()
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn()
            dt = (time.perf_counter() - t0) / reps
            out[name] = r
            print(
                f"T={T:5d} N={N} {name:6s} {dt * 1000 / N:9.2f} ms/row "
                f"(warm-up {warm:.1f} s)",
                flush=True,
            )
        eq = bool(jnp.all(tom_ops.eq(out["straus"], out["bucket"])))
        print(f"T={T:5d} backends agree: {eq}", flush=True)
        assert eq, "MSM backends disagree"


if __name__ == "__main__":
    main()
