"""Bisect the phase_b TPU fault: run each phase_b building block standalone
at increasing batch sizes, timing each, catching device errors."""
import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from zkecdsa_tpu.utils import rng
from zkecdsa_tpu.zkp_attest_list import generate_params_list
from zkecdsa_tpu.protocol.batch import DeviceParams, _digits_of, BK
from zkecdsa_tpu.ops.curve_ops import p256_ops, tom_ops
from zkecdsa_tpu.ops.limbs import P256_N, TOM_N

with rng.deterministic(42):
    params = generate_params_list()
dev = DeviceParams(params)
fn, fo = P256_N, TOM_N
ft = tom_ops.f

rnd = np.random.default_rng(0)

def rand_scalars(ctx, shape):
    vals = [int(rnd.integers(1, 2**63)) for _ in range(int(np.prod(shape)))]
    return jnp.asarray(ctx.pack(vals, mont=False)).reshape(*shape, ctx.nlimbs)

def run(name, fn_, *args):
    t0 = time.perf_counter()
    try:
        out = jax.block_until_ready(jax.jit(fn_)(*args))
        t1 = time.perf_counter()
        # re-run for exec time sans compile
        t2 = time.perf_counter()
        out = jax.block_until_ready(jax.jit(fn_)(*args))
        t3 = time.perf_counter()
        print(f"OK   {name}: compile+run {t1-t0:.1f}s, run {t3-t2:.2f}s", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)

which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "commit"):
    # commit_tom at increasing sizes
    for shape in [(16,), (2, 80, 2), (2, 80, 26)]:
        v = rand_scalars(fo, shape)
        r = rand_scalars(fo, shape)
        run(f"commit_tom {shape}", dev.commit_tom, v, r)

if which in ("all", "smul"):
    # P-256 scalar_mul_table from a shared table over [2,80]
    tabG = dev.tab_G
    z = rand_scalars(fn, (2, 80))
    run("p256 smul_table [2,80]", lambda zz: p256_ops.scalar_mul_table(jnp.asarray(tabG), _digits_of(fn, zz)), z)

if which in ("all", "cys"):
    # tom table build + 2 scalar muls over [2,80,4] (the C4/A42 block)
    pts = tom_ops.identity((2, 80, 4))
    xs = rand_scalars(fo, (2, 80, 4))
    def c4(pts_, xs_):
        tab = tom_ops.table(pts_)
        a = tom_ops.scalar_mul_table(tab, _digits_of(fo, xs_))
        b = tom_ops.scalar_mul_table(tab, _digits_of(fo, xs_))
        return a, b
    run("tom table+2xsmul [2,80,4]", c4, pts, xs)

if which in ("all", "binv"):
    x = rand_scalars(ft, (2 * 80,))
    run("tom batch_inv [160]", ft.batch_inv, x)
    x = rand_scalars(ft, (2 * 80 * 34,))
    run("tom batch_inv [5440]", ft.batch_inv, x)

if which in ("all", "affine"):
    pts = tom_ops.identity((2, 80, 34))
    run("tom to_affine [2,80,34]", tom_ops.to_affine, pts)
