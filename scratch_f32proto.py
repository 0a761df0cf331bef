"""Prototype A/B: old u16-CIOS mul vs f32 schoolbook+fold mul on TPU.
Times a chain of K muls over a batch of B elements, forcing completion
via host transfer (block_until_ready is unreliable on this backend)."""
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

P = 0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
K = 64

# ---------- f32 engine prototype ----------
LW = 34  # digits, base 2^8
RED_ROWS = LW + 1


def int_to_digits(x, n=LW):
    return [(x >> (8 * i)) & 0xFF for i in range(n)]


RED1 = np.array(
    [int_to_digits((1 << (8 * (LW + t))) % P) for t in range(RED_ROWS)],
    dtype=np.float32,
)  # [rows, LW]


def carry2(c):
    """two carry rounds; c [..., W] signed f32 ints; returns [..., W+2]."""
    for _ in range(2):
        f = jnp.floor(c * (1.0 / 256.0))
        d = c - 256.0 * f
        c = d
        c = jnp.concatenate([c, jnp.zeros_like(c[..., :1])], axis=-1)
        c = c.at[..., 1:].add(f)
    return c


def mul_f32(a, b):
    # schoolbook: cols[k] = sum_i a_i * b_{k-i}; static shifts
    W = a.shape[-1]
    cols = jnp.zeros(a.shape[:-1] + (2 * W - 1,), jnp.float32)
    for i in range(W):
        cols = cols.at[..., i : i + W].add(a[..., i : i + 1] * b)
    # reduce to LW digits
    c = carry2(cols)  # [..., 2W+1]
    lo, hi = c[..., :LW], c[..., LW:]
    rows = hi.shape[-1]
    red = jnp.asarray(RED1[:rows]) if rows <= RED_ROWS else None
    assert red is not None, rows
    folded = lo + jnp.einsum("...r,rl->...l", hi, red,
                             precision=jax.lax.Precision.HIGHEST)
    c = carry2(folded)  # [..., LW+2]
    lo, hi = c[..., :LW], c[..., LW:]
    folded = lo + jnp.einsum("...r,rl->...l", hi, jnp.asarray(RED1[: hi.shape[-1]]),
                             precision=jax.lax.Precision.HIGHEST)
    c = carry2(folded)
    spill = jnp.einsum("...r,rl->...l", c[..., LW:], jnp.asarray(RED1[: c.shape[-1] - LW]),
                       precision=jax.lax.Precision.HIGHEST)
    c = carry2(c[..., :LW] + spill)  # digits <= 256, top spill <= 1
    spill = jnp.einsum("...r,rl->...l", c[..., LW:], jnp.asarray(RED1[: c.shape[-1] - LW]),
                       precision=jax.lax.Precision.HIGHEST)
    return c[..., :LW] + spill  # digits <= 511: next mul stays f32-exact


def chain_f32(a, b):
    def step(x, _):
        return mul_f32(x, b), None
    out, _ = jax.lax.scan(step, a, None, length=K)
    return out


# correctness check on CPU-ish small batch
rnd = np.random.default_rng(0)
avals = [int.from_bytes(rnd.bytes(32), "big") % P for _ in range(4)]
bvals = [int.from_bytes(rnd.bytes(32), "big") % P for _ in range(4)]
a4 = jnp.asarray(np.array([int_to_digits(v) for v in avals], np.float32))
b4 = jnp.asarray(np.array([int_to_digits(v) for v in bvals], np.float32))
out = np.asarray(jax.jit(mul_f32)(a4, b4))
for i in range(4):
    got = sum(int(round(float(d))) << (8 * j) for j, d in enumerate(out[i])) % P
    want = avals[i] * bvals[i] % P
    assert got == want, (i, hex(got), hex(want))
print("f32 mul correct on 4 samples", flush=True)

# ---------- timing ----------
av = np.array([int_to_digits(int.from_bytes(rnd.bytes(32), "big") % P) for _ in range(B)], np.float32)
bv = np.array([int_to_digits(int.from_bytes(rnd.bytes(32), "big") % P) for _ in range(B)], np.float32)
af, bf = jnp.asarray(av), jnp.asarray(bv)
fn = jax.jit(chain_f32)
t0 = time.perf_counter()
r = np.asarray(fn(af, bf))  # includes compile
t1 = time.perf_counter()
r = np.asarray(fn(af, bf))
t2 = time.perf_counter()
per_mul_ns = (t2 - t1) / (B * K) * 1e9
print(f"f32: B={B} K={K} compile+run {t1-t0:.1f}s run {t2-t1:.3f}s -> {per_mul_ns:.1f} ns/mul", flush=True)

# ---------- old u16 path ----------
from zkecdsa_tpu.ops.limbs import P256_P as OLD

def chain_old(a, b):
    def step(x, _):
        return OLD.mul(x, b), None
    out, _ = jax.lax.scan(step, a, None, length=K)
    return out

ao = jnp.asarray(OLD.pack([int.from_bytes(rnd.bytes(32), "big") % P for _ in range(B)]))
bo = jnp.asarray(OLD.pack([int.from_bytes(rnd.bytes(32), "big") % P for _ in range(B)]))
fn2 = jax.jit(chain_old)
t0 = time.perf_counter()
r = np.asarray(fn2(ao, bo))
t1 = time.perf_counter()
r = np.asarray(fn2(ao, bo))
t2 = time.perf_counter()
per_mul_ns = (t2 - t1) / (B * K) * 1e9
print(f"u16: B={B} K={K} compile+run {t1-t0:.1f}s run {t2-t1:.3f}s -> {per_mul_ns:.1f} ns/mul", flush=True)
