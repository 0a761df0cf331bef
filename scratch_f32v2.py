"""A/B/C: mul kernel variants for the f32 digit engine on TPU."""
import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if os.environ.get("FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

P = 0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF
B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
K = 64
LW = 34

def int_to_digits(x, n=LW):
    return [(x >> (8 * i)) & 0xFF for i in range(n)]

RED1 = np.array([int_to_digits((1 << (8 * (LW + t))) % P) for t in range(LW + 3)], np.float32)
# S tensor for einsum variant
S = np.zeros((LW, LW, 2 * LW - 1), np.float32)
for i in range(LW):
    for j in range(LW):
        S[i, j, i + j] = 1.0

def carry2(c):
    for _ in range(2):
        f = jnp.floor(c * (1.0 / 256.0))
        d = c - 256.0 * f
        c = jnp.concatenate([d, jnp.zeros_like(d[..., :1])], axis=-1)
        c = c.at[..., 1:].add(f)
    return c

def reduce_cols(c):
    c = carry2(c)
    lo, hi = c[..., :LW], c[..., LW:]
    folded = lo + jnp.einsum("...r,rl->...l", hi, jnp.asarray(RED1[: hi.shape[-1]]),
                             precision=jax.lax.Precision.HIGHEST)
    c = carry2(folded)
    spill = jnp.einsum("...r,rl->...l", c[..., LW:], jnp.asarray(RED1[: c.shape[-1] - LW]),
                       precision=jax.lax.Precision.HIGHEST)
    c = carry2(c[..., :LW] + spill)
    spill = jnp.einsum("...r,rl->...l", c[..., LW:], jnp.asarray(RED1[: c.shape[-1] - LW]),
                       precision=jax.lax.Precision.HIGHEST)
    return c[..., :LW] + spill

def cols_v1(a, b):
    W = a.shape[-1]
    cols = jnp.zeros(a.shape[:-1] + (2 * W - 1,), jnp.float32)
    for i in range(W):
        cols = cols.at[..., i : i + W].add(a[..., i : i + 1] * b)
    return cols

def cols_v2(a, b):
    # skew-reshape anti-diagonal sum
    W = a.shape[-1]
    outer = a[..., ::-1, None] * b[..., None, :]  # [.., W(i rev), W(j)]
    pad = [(0, 0)] * (outer.ndim - 2) + [(0, 0), (W - 1, 0)]
    ap = jnp.pad(outer, pad)  # [.., W, 2W-1]
    flat = ap.reshape(ap.shape[:-2] + (W * (2 * W - 1),))
    flat = jnp.pad(flat, [(0, 0)] * (flat.ndim - 1) + [(0, W)])
    z = flat.reshape(flat.shape[:-1] + (W, 2 * W))
    return z.sum(axis=-2)[..., : 2 * W - 1]

def cols_v3(a, b):
    return jnp.einsum("...i,...j,ijk->...k", a, b, jnp.asarray(S),
                      precision=jax.lax.Precision.HIGHEST)

rnd = np.random.default_rng(0)
avals = [int.from_bytes(rnd.bytes(32), "big") % P for _ in range(8)]
bvals = [int.from_bytes(rnd.bytes(32), "big") % P for _ in range(8)]
a8 = jnp.asarray(np.array([int_to_digits(v) for v in avals], np.float32))
b8 = jnp.asarray(np.array([int_to_digits(v) for v in bvals], np.float32))
for name, cf in [("v1", cols_v1), ("v2", cols_v2), ("v3", cols_v3)]:
    out = np.asarray(jax.jit(lambda x, y: reduce_cols(cf(x, y)))(a8, b8))
    for i in range(8):
        got = sum(int(round(float(d))) << (8 * j) for j, d in enumerate(out[i])) % P
        assert got == avals[i] * bvals[i] % P, (name, i)
    print(f"{name} correct", flush=True)

av = np.array([int_to_digits(int.from_bytes(rnd.bytes(32), "big") % P) for _ in range(B)], np.float32)
bv = np.array([int_to_digits(int.from_bytes(rnd.bytes(32), "big") % P) for _ in range(B)], np.float32)
af, bf = jnp.asarray(av), jnp.asarray(bv)
for name, cf in [("v1", cols_v1), ("v2", cols_v2), ("v3", cols_v3)]:
    def chain(x, y, cf=cf):
        def step(s, _):
            return reduce_cols(cf(s, y)), None
        out, _ = jax.lax.scan(step, x, None, length=K)
        return out
    fn = jax.jit(chain)
    t0 = time.perf_counter(); r = np.asarray(fn(af, bf)); t1 = time.perf_counter()
    r = np.asarray(fn(af, bf)); t2 = time.perf_counter()
    print(f"{name}: B={B} compile {t1-t0:.1f}s run {t2-t1:.3f}s -> {(t2-t1)/(B*K)*1e9:.1f} ns/mul", flush=True)
