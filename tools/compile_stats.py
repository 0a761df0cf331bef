"""Lower (don't compile) the batched phase programs and count StableHLO ops
- the compile-time driver metric (VERDICT r2 weak #4)."""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zkecdsa_tpu.utils import rng
from zkecdsa_tpu.zkp_attest_list import generate_params_list
from zkecdsa_tpu.protocol.batch import device_params_for, _phase_fns, BK, SECPARAM
from zkecdsa_tpu.protocol.batch_verify import _vphase_fn
from zkecdsa_tpu.ops.f32field import P256_N, TOM_N
from zkecdsa_tpu.ops.curve_ops import p256_ops, nibble_digits

N = int(os.environ.get("STATS_N", "2"))
S = 20

with rng.deterministic(5):
    params = generate_params_list()
dev = device_params_for(params)
phase_a, phase_b = _phase_fns(dev)
vphase = _vphase_fn(dev)

L = P256_N.nlimbs
f32 = jnp.float32

def count(name, fn, *args):
    t0 = time.perf_counter()
    lowered = fn.lower(*args)
    t_lower = time.perf_counter() - t0
    txt = lowered.as_text()
    nops = sum(txt.count(k) for k in (" = stablehlo.", " = mhlo."))
    print(f"{name}: {nops} stablehlo ops, lower {t_lower:.1f}s, text {len(txt)/1e6:.1f} MB")
    return lowered

def z(*shape):
    return jnp.zeros(shape + (L,), f32)

tabs = {
    "G": z(16, 3), "h_n": z(16, 3), "g_t": z(16, 4), "h_t": z(16, 4),
    "g_t8": z(32, 256, 4), "h_t8": z(32, 256, 4), "h_n8": z(32, 256, 3),
}
a_args = (tabs, z(N, 3), z(N), z(N), z(N), z(N), z(N), z(N), z(N), z(N), z(N),
          z(N, SECPARAM), z(N, SECPARAM), z(N, SECPARAM), z(N, SECPARAM))
low_a = count("phase_a", phase_a, *a_args)
E = 56
b_args = (tabs, z(N, 16, 3), z(N, 3), z(N, SECPARAM, 4), z(N, SECPARAM, 4),
          z(N, 4), z(N, 4), z(N, SECPARAM), z(N), z(N),
          z(N, E), z(N, E, BK), z(N, E, BK),
          jnp.zeros((N, E), jnp.int32))
low_b = count("phase_b", phase_b, *b_args)
v_args = (tabs, z(N, 3), jnp.zeros((N, 64), jnp.int32),
          jnp.zeros((N, S, 64), jnp.int32),
          jnp.zeros((N, S), bool), z(N, S, 2))
low_v = count("vphase", vphase, *v_args)

if os.environ.get("STATS_COMPILE", "") == "1":
    for name, low in (("phase_a", low_a), ("phase_b", low_b), ("vphase", low_v)):
        t0 = time.perf_counter()
        low.compile()
        print(f"{name}: CPU compile {time.perf_counter() - t0:.1f}s")
