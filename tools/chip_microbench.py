"""Microbenchmark mul formulations on the real TPU chip (default backend).

Variants:
  dus     - current schoolbook: 40 static-shift dynamic-update-slices (VPU)
  onehot  - outer product + one dot_general with a one-hot [W*W, 2W-1]
            tensor (MXU, HIGHEST precision)
  blast   - batch-last layout prototype: digits on axis -2, batch in lanes
            (VPU, full lane utilization)
  blast_mxu - batch-last + one-hot dot over the digit axes (MXU)

Each is checked exact vs Python ints, then timed.
"""
import os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from zkecdsa_tpu.ops.f32field import P256_P, BASE, BASE_BITS, F32_EXACT

f = P256_P
L = f.nlimbs
HI = jax.lax.Precision.HIGHEST
print("devices:", jax.devices())

B = int(os.environ.get("MB_B", "16384"))
REPS = int(os.environ.get("MB_REPS", "50"))
rs = np.random.RandomState(0)
a_i = [int.from_bytes(rs.bytes(31), "big") % f.p for _ in range(B)]
b_i = [int.from_bytes(rs.bytes(31), "big") % f.p for _ in range(B)]
want = np.array([x * y % f.p for x, y in zip(a_i, b_i)], dtype=object)

a = jnp.asarray(f.pack(a_i))
b = jnp.asarray(f.pack(b_i))
a_t = jnp.asarray(np.asarray(a).T.copy())  # [L, B] batch-last
b_t = jnp.asarray(np.asarray(b).T.copy())


def conv_onehot_mat(W):
    M = np.zeros((W * W, 2 * W - 1), np.float32)
    for i in range(W):
        for j in range(W):
            M[i * W + j, i + j] = 1.0
    return M


def reduce_cols(cols, cb):
    return f._reduce(cols, cb)


def mul_dus(a, b):
    return f.mul(a, b)


def mul_onehot(a, b):
    # canonical inputs: digit bound 127, no prep needed
    W = a.shape[-1]
    outer = (a[..., :, None] * b[..., None, :]).reshape(a.shape[:-1] + (W * W,))
    cols = jnp.einsum("...m,mk->...k", outer, jnp.asarray(conv_onehot_mat(W)),
                      precision=HI)
    cb = [min(k + 1, W, 2 * W - 1 - k) * 127 * 127 for k in range(2 * W - 1)]
    return reduce_cols(cols, cb)


# ---- batch-last prototype: minimal mul+fold+carry on [L, B] ----
RED = np.asarray(f.red)      # [nred, L]
def carry_bl(c, bnd):
    fq = jnp.floor(c * (1.0 / BASE))
    d = c - fq * float(BASE)
    d = jnp.concatenate([d, jnp.zeros_like(d[:1])], axis=0)
    out = d.at[1:].add(fq)
    nb = [min(bnd[0], BASE - 1)]
    for i in range(1, len(bnd)):
        nb.append(min(bnd[i], BASE - 1) + bnd[i - 1] // BASE)
    nb.append(bnd[-1] // BASE)
    return out, nb

def fold_bl(c, bnd):
    rows = len(bnd) - L
    spill = sum(bnd[L + t] for t in range(rows))
    hi = c[L:]
    folded = c[:L] + jnp.einsum("rb,rl->lb", hi, jnp.asarray(RED[:rows]),
                                precision=HI)
    nb = [min(bi + spill * (BASE - 1), bi + spill * (BASE - 1)) for bi in bnd[:L]]
    return folded, nb

def reduce_bl(c, bnd):
    for _ in range(64):
        if len(bnd) == L and max(bnd) <= 26000:
            return c
        if len(bnd) > L:
            spill = sum(bnd[L + t] for t in range(len(bnd) - L))
            fr = max(bnd[:L]) + spill * (BASE - 1)
            if fr < F32_EXACT and (fr <= 26000 or max(bnd) <= 192):
                c, bnd = fold_bl(c, bnd)
                continue
        c, bnd = carry_bl(c, bnd)
    raise AssertionError(bnd)

def mul_blast(at, bt):
    W = at.shape[0]
    cols = jnp.zeros((2 * W - 1,) + at.shape[1:], jnp.float32)
    for i in range(W):
        cols = cols.at[i : i + W].add(at[i] * bt)
    cb = [min(k + 1, W, 2 * W - 1 - k) * 127 * 127 for k in range(2 * W - 1)]
    return reduce_bl(cols, cb)

def mul_blast_mxu(at, bt):
    W = at.shape[0]
    outer = (at[:, None, :] * bt[None, :, :]).reshape(W * W, -1)
    cols = jnp.einsum("mb,mk->kb", outer, jnp.asarray(conv_onehot_mat(W)),
                      precision=HI)
    cb = [min(k + 1, W, 2 * W - 1 - k) * 127 * 127 for k in range(2 * W - 1)]
    return reduce_bl(cols, cb)


def check(name, out_arr, transposed):
    arr = np.asarray(out_arr, np.float64)
    if transposed:
        arr = arr.T
    got = [sum(int(d) << (BASE_BITS * i) for i, d in enumerate(row)) % f.p
           for row in arr.astype(np.int64)]
    ok = all(g == w for g, w in zip(got, want))
    print(f"{name}: exact={ok}")
    assert ok, name


def bench(name, fn, *args):
    jfn = jax.jit(fn)
    out = jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name}: {dt * 1e9 / B:8.1f} ns/el   ({dt*1e3:.2f} ms/call, B={B})")
    return out


out = bench("dus      ", mul_dus, a, b); check("dus", out, False)
out = bench("onehot   ", mul_onehot, a, b); check("onehot", out, False)
out = bench("blast    ", mul_blast, a_t, b_t); check("blast", out, True)
out = bench("blast_mxu", mul_blast_mxu, a_t, b_t); check("blast_mxu", out, True)
