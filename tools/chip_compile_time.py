"""Compile (don't run) the batched phase programs on the real chip and
report wall-clock compile times (VERDICT r2 weak #4: 841s + 512s)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

print("devices:", jax.devices())
from zkecdsa_tpu.utils import rng
from zkecdsa_tpu.zkp_attest_list import generate_params_list
from zkecdsa_tpu.protocol.batch import device_params_for, _phase_fns, BK, SECPARAM
from zkecdsa_tpu.protocol.batch_verify import _vphase_fn
from zkecdsa_tpu.ops.f32field import P256_N

N = int(os.environ.get("STATS_N", "16"))
S = 20
with rng.deterministic(5):
    params = generate_params_list()
dev = device_params_for(params)
phase_a, phase_b = _phase_fns(dev)
vphase = _vphase_fn(dev)
L = P256_N.nlimbs
f32 = jnp.float32
z = lambda *s: jnp.zeros(s + (L,), f32)

E = 56
tabs = {
    "G": z(16, 3), "h_n": z(16, 3), "g_t": z(16, 4), "h_t": z(16, 4),
    "g_t8": z(32, 256, 4), "h_t8": z(32, 256, 4), "h_n8": z(32, 256, 3),
}
a_args = (tabs, z(N, 3), z(N), z(N), z(N), z(N), z(N), z(N), z(N), z(N), z(N),
          z(N, SECPARAM), z(N, SECPARAM), z(N, SECPARAM), z(N, SECPARAM))
b_args = (tabs, z(N, 16, 3), z(N, 3), z(N, SECPARAM, 4), z(N, SECPARAM, 4),
          z(N, 4), z(N, 4), z(N, SECPARAM), z(N), z(N),
          z(N, E), z(N, E, BK), z(N, E, BK), jnp.zeros((N, E), jnp.int32))
v_args = (tabs, z(N, 3), jnp.zeros((N, 64), jnp.int32),
          jnp.zeros((N, S, 64), jnp.int32),
          jnp.zeros((N, S), bool), z(N, S, 2))

for name, fn, args in (("phase_a", phase_a, a_args),
                       ("phase_b", phase_b, b_args),
                       ("vphase", vphase, v_args)):
    t0 = time.perf_counter()
    low = fn.lower(*args)
    t1 = time.perf_counter()
    low.compile()
    t2 = time.perf_counter()
    print(f"{name}: lower {t1-t0:.1f}s, compile {t2-t1:.1f}s", flush=True)
