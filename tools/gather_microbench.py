"""Comb-window gather strategies at 256 vs 4096 table entries (chip).

Decides whether WIDER comb windows (12-bit: 22 window-adds per base
instead of 32) are feasible: the current one-hot MXU gather materializes
a [rows, entries] f32 operand, which scales linearly with entry count
and is hopeless at 4096; a plain dynamic gather (``table[digits]``) costs
HBM traffic proportional to rows only.  If the plain gather at 4096
entries costs <= ~1.5x the one-hot at 256, the 12-bit comb path wins
~31% of the dominant commit-stack adds (PARITY.md round-5 roadmap #1).

Each variant runs a 22-step scan (gather + Edwards mixed add) over the
same row batch; variants interleave in ONE process (round-4 microbench
hygiene).  Usage: python tools/gather_microbench.py [rows_log2=14]
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

    enable_persistent_cache(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    )

    from zkecdsa_tpu.ops.curve_ops import tom_ops

    rows = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 14)
    ops = tom_ops
    NC, L = 5, ops.f.nlimbs  # mixed-add table rows
    D = 22  # 12-bit window count (265-bit scalars)
    rs = np.random.RandomState(0)

    def table(entries):
        # synthetic mixed-table digits (valid canonical range)
        return jnp.asarray(
            rs.randint(0, 128, (D, entries, NC, L)).astype(np.float32)
        )

    def digits(entries):
        return jnp.asarray(rs.randint(0, entries, (rows, D)).astype(np.int32))

    def scan_onehot(tab, d8):
        tab_flat = tab.reshape(D, tab.shape[1], NC * L)
        dcols = jnp.moveaxis(d8, -1, 0)

        def step(acc, xs):
            dj, tabj = xs
            oh = (
                dj[..., None]
                == jax.lax.broadcasted_iota(
                    jnp.int32, (1, tabj.shape[0]), 1
                )[0]
            ).astype(jnp.float32)
            term = jnp.einsum(
                "rk,km->rm", oh, tabj,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(rows, NC, L)
            return ops.add_mixed(acc, term), None

        acc, _ = jax.lax.scan(step, ops.identity((rows,)), (dcols, tab_flat))
        return acc

    def scan_take(tab, d8):
        dcols = jnp.moveaxis(d8, -1, 0)

        def step(acc, xs):
            dj, tabj = xs  # [rows], [entries, NC, L]
            term = tabj[dj]  # plain dynamic gather
            return ops.add_mixed(acc, term), None

        acc, _ = jax.lax.scan(step, ops.identity((rows,)), (dcols, tab))
        return acc

    jits = {
        "onehot": jax.jit(scan_onehot),
        "take": jax.jit(scan_take),
    }
    for entries in (256, 4096):
        tab, d8 = table(entries), digits(entries)
        out = {}
        for name, fn in jits.items():
            t0 = time.perf_counter()
            r = jax.block_until_ready(fn(tab, d8))
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(3):
                r = jax.block_until_ready(fn(tab, d8))
            dt = (time.perf_counter() - t0) / 3
            out[name] = r
            print(
                f"entries={entries:5d} rows={rows} {name:7s} "
                f"{dt * 1e3:8.1f} ms/scan ({dt * 1e9 / (rows * D):6.1f} "
                f"ns per gather+add) warm-up {warm:.1f} s",
                flush=True,
            )
        same = bool(jnp.all(out["onehot"] == out["take"]))
        print(f"entries={entries:5d} variants agree: {same}", flush=True)
        assert same


if __name__ == "__main__":
    main()
