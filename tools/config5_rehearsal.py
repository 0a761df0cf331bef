"""Config-5 shape rehearsal (BASELINE.md: multi-host ZKAttest @ ring 2^16,
ring + MSM sharded across hosts) on the virtual 8-device CPU mesh.

Compiles and executes the ring-sharded GK kernels and the term-sharded MSM
at config-5 shapes - evidence that the sharding layout works beyond toy
rings (VERDICT r3 item 9), without multi-host hardware.  The all_gather
folds in these kernels ride the mesh's ``ring`` axis; on a real v5p-32
deployment that axis maps to ICI within hosts and DCN across, with no code
change (jax.distributed initializes the same Mesh over multi-host
devices).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/config5_rehearsal.py [ring_log2=16] [N=8]

Prints per-kernel compile+run wall times and cross-checks the sharded
results against the single-device kernels (bit-exact ints).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax

    # sitecustomize imports jax at interpreter boot and freezes
    # jax_platforms before env vars are read (tests/conftest.py); force
    # the platform through the config API so the virtual CPU mesh is
    # honored even on a machine with a tunneled TPU.
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    ring_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    RING, n = 1 << ring_log2, ring_log2

    from zkecdsa_tpu.ops.f32field import TOM_N
    from zkecdsa_tpu.parallel.mesh import (
        make_mesh_2d,
        sharded_gk_dvalues,
        sharded_gk_recombine,
        sharded_msm,
    )
    from zkecdsa_tpu.protocol.batch_gk import (
        gk_dvalues_device,
        gk_recombine_device,
    )

    fo = TOM_N
    devs = len(jax.devices())
    mesh = make_mesh_2d(2, devs // 2)
    print(f"mesh {dict(mesh.shape)}; ring 2^{ring_log2} = {RING}, N={N}")
    rs = np.random.RandomState(0)

    def rnd(k):
        return [int.from_bytes(rs.bytes(32), "big") % fo.p for _ in range(k)]

    vals = jnp.asarray(fo.pack(rnd(RING)))
    eli = jnp.asarray(rs.randint(0, 2, (N, n)).astype(np.int32))
    ai = jnp.asarray(fo.pack(rnd(N * n))).reshape(N, n, -1)
    vidx = jnp.asarray(fo.pack(rnd(N)))
    f_arr = jnp.asarray(fo.pack(rnd(N * n))).reshape(N, n, -1)
    xf_arr = jnp.asarray(fo.pack(rnd(N * n))).reshape(N, n, -1)

    def timed(name, fn):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        warm = time.perf_counter() - t0
        print(f"{name:<28} cold {cold:7.1f} s   warm {warm:7.3f} s", flush=True)
        return out

    dv_s = timed(
        "sharded_gk_dvalues", lambda: sharded_gk_dvalues(
            mesh, eli, ai, vals, vidx, dp_axis="dp"
        )
    )
    dv_1 = timed(
        "gk_dvalues (1-dev)", lambda: gk_dvalues_device(eli, ai, vals, vidx)
    )
    assert fo.unpack_canonical(dv_s) == fo.unpack_canonical(dv_1)
    print("d-values sharded == single-device (bit-exact)")

    rc_s = timed(
        "sharded_gk_recombine", lambda: sharded_gk_recombine(
            mesh, f_arr, xf_arr, vals, dp_axis="dp"
        )
    )
    rc_1 = timed(
        "gk_recombine (1-dev)", lambda: gk_recombine_device(f_arr, xf_arr, vals)
    )
    assert fo.unpack_canonical(rc_s) == fo.unpack_canonical(rc_1)
    print("recombination sharded == single-device (bit-exact)")

    # term-sharded MSM at a config-5-ish term count
    from zkecdsa_tpu.curves.instances import tomEdwards256
    from zkecdsa_tpu.ops.curve_ops import nibble_digits, tom_ops

    T = 4096
    g = tomEdwards256
    pool = [g.generator().mul(g.new_scalar(k + 2)) for k in range(32)]
    pts = np.tile(tom_ops.pack_points(pool), ((T + 31) // 32, 1, 1))[:T]
    scal = [int.from_bytes(rs.bytes(32), "big") % g.order for _ in range(T)]
    digs = jnp.asarray(nibble_digits(scal))
    out_s = timed(
        f"sharded_msm T={T}", lambda: sharded_msm(
            mesh, tom_ops, jnp.asarray(pts), digs
        )
    )
    out_1 = timed(
        f"msm_shared T={T} (1-dev)", lambda: tom_ops.msm_shared(
            jnp.asarray(pts), digs
        )
    )
    assert bool(tom_ops.eq(out_s, out_1))
    print("MSM sharded == single-device")
    print("config-5 rehearsal OK")


if __name__ == "__main__":
    main()
