"""Bisect inside phase_b: compute up to LEVEL and return."""
import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from zkecdsa_tpu.utils import rng
from zkecdsa_tpu.zkp_attest_list import generate_params_list
from zkecdsa_tpu.protocol.batch import DeviceParams, _digits_of, BK, _std
from zkecdsa_tpu.ops.curve_ops import p256_ops, tom_ops
from zkecdsa_tpu.ops.limbs import P256_N, TOM_N

with rng.deterministic(42):
    params = generate_params_list()
dev = DeviceParams(params)
fn, fo = P256_N, TOM_N
fw = p256_ops.f
ft = tom_ops.f
N = 2

rnd = np.random.default_rng(0)
def rs(ctx, shape):
    vals = [int.from_bytes(rnd.bytes(25), "big") for _ in range(int(np.prod(shape)))]
    return jnp.asarray(ctx.pack(vals, mont=False)).reshape(*shape, ctx.nlimbs)

def tom_affine_std(P):
    x, y, _ = tom_ops.to_affine(P)
    return _std(ft, x), _std(ft, y)

def nist_affine_std(P):
    x, y, inf = p256_ops.to_affine(P)
    return _std(fw, x), _std(fw, y), inf

LEVEL = int(sys.argv[1])

def phase_b(tab_R, Q, TxC, pkX, pkY, Tx_v, pkx_v, pky_v, z, com_vals, com_blinds):
    T1 = p256_ops.add(
        p256_ops.scalar_mul_table(tab_R[:, None], _digits_of(fn, z)),
        Q[:, None],
    )
    if LEVEL == 0:
        return T1
    t1x, t1y, _ = nist_affine_std(T1)
    if LEVEL == 1:
        return t1x
    t1x_m, t1y_m = fo.to_mont(t1x), fo.to_mont(t1y)
    pkx_m, pky_m = fo.to_mont(pkx_v[:, None]), fo.to_mont(pky_v[:, None])
    txv_m = fo.to_mont(Tx_v)
    i7 = fo.sub(pkx_m, t1x_m)
    i8 = fo.batch_inv(i7.reshape(-1, i7.shape[-1])).reshape(i7.shape)
    i9 = fo.sub(pky_m, t1y_m)
    i10 = fo.mul(i8, i9)
    i11 = fo.mul(i10, i10)
    i12 = fo.sub(t1x_m, txv_m)
    i13 = fo.mul(i10, i12)
    ints_std = [_std(fo, v) for v in (i7, i8, i9, i10, i11, i12, i13)]
    if LEVEL == 2:
        return ints_std
    fills = [t1x, t1y, ints_std[1], ints_std[3], ints_std[4], ints_std[6]]
    com_vals = com_vals.at[..., :6, :].set(jnp.stack(fills, axis=-2))
    commits = dev.commit_tom(com_vals, com_blinds)
    if LEVEL == 3:
        return commits
    T1xC = commits[..., 0, :, :]
    T1yC = commits[..., 1, :, :]
    C9 = tom_ops.add(pkY[:, None], tom_ops.neg(T1yC))
    C12 = tom_ops.add(T1xC, tom_ops.neg(TxC))
    cys = jnp.stack(
        [commits[..., 2, :, :], C9, commits[..., 3, :, :], C12], axis=-3
    )
    xs = jnp.stack(
        [ints_std[0], ints_std[1], ints_std[3], ints_std[3]], axis=-2
    )
    tab_cy = tom_ops.table(cys)
    C4s = tom_ops.scalar_mul_table(tab_cy, _digits_of(fo, xs))
    if LEVEL == 4:
        return C4s
    kx = com_vals[..., 6:10, :]
    A42s = tom_ops.scalar_mul_table(tab_cy, _digits_of(fo, kx))
    if LEVEL == 5:
        return A42s
    tom_stack = jnp.concatenate([commits, C4s, A42s], axis=-3)
    sx, sy = tom_affine_std(tom_stack)
    return sx, sy

args = (
    jnp.asarray(np.tile(dev.tab_G[None], (N, 1, 1, 1))),  # tab_R stand-in
    p256_ops.identity((N,)) ,                              # Q
    tom_ops.identity((N, 80)),                             # TxC
    tom_ops.identity((N,)), tom_ops.identity((N,)),        # pkX, pkY
    rs(fo, (N, 80)), rs(fo, (N,)), rs(fo, (N,)),           # Tx_v, pkx_v, pky_v
    rs(fn, (N, 80)),                                       # z
    rs(fo, (N, 80, BK)), rs(fo, (N, 80, BK)),              # com_vals, com_blinds
)

t0 = time.perf_counter()
out = jax.block_until_ready(jax.jit(phase_b)(*args))
t1 = time.perf_counter()
out2 = jax.block_until_ready(jax.jit(phase_b)(*args))
t2 = time.perf_counter()
print(f"LEVEL {LEVEL}: OK compile+run {t1-t0:.1f}s run {t2-t1:.2f}s", flush=True)
