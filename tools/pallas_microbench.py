"""Pallas fused kernels vs the XLA-fused engine on the real chip
(VERDICT r2 item 10: decide the SURVEY section 7.1 Pallas question with
data).  Prints ns/element for modular multiply and full curve additions.

Run on the chip:  python tools/pallas_microbench.py
Env: PB_BATCH (default 16384), PB_REPS (default 30).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from zkecdsa_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
)

from zkecdsa_tpu.curves.instances import p256, tomEdwards256
from zkecdsa_tpu.ops.curve_ops import p256_ops, tom_ops
from zkecdsa_tpu.ops.f32field import P256_P
from zkecdsa_tpu.ops.pallas_field import pallas_ec_add, pallas_mul

B = int(os.environ.get("PB_BATCH", "16384"))
REPS = int(os.environ.get("PB_REPS", "30"))
print(f"devices: {jax.devices()}  batch {B}  reps {REPS}")


def bench(name, fn, *args):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    ns = (time.perf_counter() - t0) / REPS / B * 1e9
    print(f"{name:<44} {ns:10.1f} ns/element")
    return ns


rs = np.random.RandomState(9)
f = P256_P
a = jnp.asarray(f.pack([int.from_bytes(rs.bytes(31), "big") for _ in range(B)]))
b = jnp.asarray(f.pack([int.from_bytes(rs.bytes(31), "big") for _ in range(B)]))

xla_mul = jax.jit(f.mul)
r_xla = bench("field/mul  XLA-fused", xla_mul, a, b)
for blk in (128, 256):
    r_pal = bench(f"field/mul  pallas block={blk}", pallas_mul(f, block=blk), a, b)

for gname, g, ops in (("p256", p256, p256_ops), ("tom", tomEdwards256, tom_ops)):
    pts = [g.generator().mul(g.new_scalar(k + 2)) for k in range(64)]
    P = jnp.asarray(ops.pack_points((pts * ((B // 64) + 1))[:B]))
    Q = jnp.asarray(np.roll(np.asarray(P), 7, axis=0))
    bench(f"{gname}/ec_add  XLA-fused", ops.add, P, Q)
    for blk in (64, 128):
        bench(f"{gname}/ec_add  pallas block={blk}", pallas_ec_add(ops, block=blk), P, Q)
