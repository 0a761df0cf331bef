"""Comb-gather and point-add variants on the chip: what the prover's
Pedersen commit stack (protocol/batch.py phase_b) actually pays per window
step, and which gather implementation is fastest.

The comb scan (CurveOps.mul_comb) does per window: one 256-entry gather
(currently a one-hot f32 MXU dot) + one Edwards add over the whole row
batch.  Candidate gathers:

* f32   - current: one-hot f32 einsum (materializes [rows, 256] f32)
* bf16  - one-hot + table cast to bf16, f32 accumulation (exact: one-hot
          is 0/1, and bf16 represents integers up to 256 exactly - the
          device-built comb-table digits reach 255, measured; asserted
          below before the bf16 variant runs.  Halves one-hot traffic,
          bf16 MXU passes are 4-6x f32)
* wsum  - fused where-sum over the 256 entries (no one-hot in HBM, but
          256x the VPU elementwise work)

Also times a bare 64-step add chain and a 64-step dbl chain at the same
row count - the per-point-op floor the engine gives XLA.

Usage: python tools/comb_microbench.py [rows_log2=15]
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
    from zkecdsa_tpu.ops.curve_ops import byte_digits, tom_ops
    from zkecdsa_tpu.utils import rng

    rows = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 15)
    g = tomEdwards256
    ops = tom_ops
    C, L = ops.NCOORD, ops.f.nlimbs
    rs = np.random.RandomState(0)

    with rng.deterministic(3):
        base = g.generator().mul(g.new_scalar(12345))
    comb = np.asarray(ops.comb_table(jnp.asarray(ops.pack_points([base])[0])))
    # bf16 exactness bound for the variant below: integers <= 256 only
    assert comb.max() <= 256, comb.max()
    D = comb.shape[0]
    scal = [int.from_bytes(rs.bytes(32), "big") % g.order for _ in range(rows)]
    d8 = jnp.asarray(byte_digits(scal).astype(np.int32))  # [rows, 32]
    comb_j = jnp.asarray(comb)

    def scan_gather(gather):
        def run(comb_t, d):
            dcols = jnp.moveaxis(d, -1, 0)

            def step(acc, xs):
                dj, tabj = xs
                return ops.add(acc, gather(tabj, dj)), None

            acc, _ = jax.lax.scan(
                step, ops.identity((rows,)), (dcols, comb_t)
            )
            return acc

        return jax.jit(run)

    def g_f32(tabj, dj):
        oh = (
            dj[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        ).astype(jnp.float32)
        return jnp.einsum(
            "rk,km->rm", oh, tabj.reshape(256, C * L),
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(rows, C, L)

    def g_bf16(tabj, dj):
        oh = (
            dj[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        ).astype(jnp.bfloat16)
        return jnp.einsum(
            "rk,km->rm", oh, tabj.reshape(256, C * L).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).reshape(rows, C, L)

    def g_wsum(tabj, dj):
        oh = dj[:, None, None, None] == jax.lax.broadcasted_iota(
            jnp.int32, (256, 1, 1), 0
        )
        return jnp.sum(jnp.where(oh, tabj, 0.0), axis=-3)

    variants = {"f32": g_f32, "bf16": g_bf16, "wsum": g_wsum}

    def bench(name, fn, *args):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        cold = time.perf_counter() - t0
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jax.block_until_ready(fn(*args))
        warm = (time.perf_counter() - t0) / reps
        print(
            f"{name:<22} warm {warm * 1000:9.1f} ms "
            f"({warm * 1e9 / (rows * D):7.1f} ns/row/window; cold {cold:.1f} s)",
            flush=True,
        )
        return out

    outs = {}
    for name, gfn in variants.items():
        outs[name] = bench(f"comb scan {name}", scan_gather(gfn), comb_j, d8)
    for name in ("bf16", "wsum"):
        same = bool(jnp.all(outs[name] == outs["f32"]))
        print(f"{name} == f32: {same}")
        assert same

    # bare point-op chains at the same row count (floor check)
    P = outs["f32"]

    @jax.jit
    def add_chain(P0):
        def step(acc, _):
            return ops.add(acc, P0), None

        acc, _ = jax.lax.scan(step, P0, None, length=64)
        return acc

    @jax.jit
    def dbl_chain(P0):
        def step(acc, _):
            return ops.dbl(acc), None

        acc, _ = jax.lax.scan(step, P0, None, length=64)
        return acc

    bench("add chain x64", add_chain, P)
    bench("dbl chain x64", dbl_chain, P)

    # field-op floor: 64 chained muls at the same element count
    f = ops.f

    @jax.jit
    def mul_chain(a):
        def step(acc, _):
            return f.mul(acc, a), None

        acc, _ = jax.lax.scan(step, a, None, length=64)
        return acc

    bench("fmul chain x64", mul_chain, P[:, 0])


if __name__ == "__main__":
    main()
