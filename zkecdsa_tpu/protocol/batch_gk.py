"""Batched Groth-Kohlweiss membership proofs on device (config 3 of
BASELINE.md: ring 2^10+, batched polynomial evaluation on one chip).

The prover's hot loop is the d-polynomial evaluation: for each of n
evaluation points it builds the 2^n ratio-product table and folds the ring
(reference src/proofGK/gk.ts:135-171, O(n*N_ring) field ops).  Here the
table build is n successive doublings of a [batch, 2^k] block and the fold
is one multiply + log-tree sum - all on the Tom-order field limb arrays.

The verifier's O(N_ring * n) recombination (gk.ts:239-250) becomes n
masked multiplies over a [batch, RING] array + a log-tree sum.

Both produce values bit-identical to the host path (exact integer math),
so ``batch_prove_membership`` emits byte-identical GKProof objects for the
same random tape.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..bignum import big
from ..commit.pedersen import Commitment, PedersenParams
from ..curves.edwards import TEdwardsPoint
from ..curves.group import hash_points
from ..curves.instances import tomEdwards256
from ..proofGK.gk import GKProof, _pad, gk_statement_bind
from ..proofGK.interpolate import interpolate
from ..ops.f32field import TOM_N
from ..ops.curve_ops import tom_ops
from ..utils import rng

__all__ = [
    "gk_dvalues_device",
    "gk_recombine_device",
    "batch_prove_membership",
    "batch_verify_membership",
    "aggregate_membership",
]

fo = TOM_N


def _ring_len(n_values: int) -> tuple[int, int]:
    pad_len = 1 << (n_values - 1).bit_length() if n_values > 1 else 1
    n = (pad_len - 1).bit_length() if pad_len > 1 else 0
    return pad_len, n


def _ring_sharded(mesh, RING: int) -> bool:
    """Use the ring-sharded collective kernels when the mesh has a ``ring``
    axis the padded ring divides across (config 5 of BASELINE.md)."""
    return (
        mesh is not None
        and "ring" in getattr(mesh, "shape", {})
        and mesh.shape["ring"] > 1
        and RING % mesh.shape["ring"] == 0
        and RING // mesh.shape["ring"] >= 1
    )


def _fold_ring(values: jnp.ndarray, factors0, factors1) -> jnp.ndarray:
    """sum_i values_i * prod_j (factors1_j if bit_j(i) else factors0_j):
    contract the ring axis one index bit at a time (LSB first), halving it
    per step.  ``values`` [..., 2^n, L]; ``factors0/1[j]`` broadcastable to
    the result of step j ([..., 2^(n-1-j), L]).  2*RING multiplies total
    and peak live memory [..., RING/2, L] - this replaces both the
    reference's 2^n ratio-product table (gk.ts:155-163, needs inversions)
    and the verifier's per-element n-factor products (gk.ts:243-248,
    O(n*RING) multiplies), with no [N, RING, L] materialization."""
    T = values
    for j in range(len(factors0)):
        T = fo.add(
            fo.mul(factors0[j], T[..., 0::2, :]),
            fo.mul(factors1[j], T[..., 1::2, :]),
        )
    return T[..., 0, :]


@jax.jit
def gk_dvalues_device(
    eli: jnp.ndarray,  # [N, n] int32 index bits (LSB first)
    ai: jnp.ndarray,  # [N, n, L]
    values: jnp.ndarray,  # [RING, L] (padded ring)
    v_index: jnp.ndarray,  # [N, L] (values[which] per instance)
) -> jnp.ndarray:
    """d-polynomial values at omega = 0..n-1: [N, n, L] canonical.

    d(w) = sum_i (v_index - v_i) * p_i(w) with p_i(w) = prod_j f_{bit_j(i),j}(w)
    (gk.ts:135-171) is evaluated as v_index * prod_j (f0_j + f1_j)  -
    fold(values)  : the first term uses sum_i p_i = prod_j (f0_j + f1_j),
    the second is the bitwise ring contraction (see _fold_ring).  One
    ``lax.scan`` over the n evaluation points keeps the compiled program
    size independent of n (the former unrolled w-loop materialized
    [N, RING, L] products per point - untenable at ring 2^12)."""
    N, n = eli.shape[0], eli.shape[1]
    elib = eli[..., None] > 0  # [N, n, 1]
    ws = jnp.asarray(np.stack([fo.const(w) for w in range(n)]))  # [n, L]

    def body(_, w_m):
        # f0 = (1-el)*w - a ; f1 = el*w + a  (gk.ts:146-148)
        f0 = jnp.where(elib, fo.neg(ai), fo.sub(w_m, ai))  # [N, n, L]
        f1 = jnp.where(elib, fo.add(w_m, ai), ai)
        s = fo.add(f0[:, 0], f1[:, 0])  # sum_i p_i(w)
        for j in range(1, n):
            s = fo.mul(s, fo.add(f0[:, j], f1[:, j]))
        fold = _fold_ring(
            jnp.broadcast_to(values[None], (N,) + values.shape),
            [f0[:, j][:, None, :] for j in range(n)],
            [f1[:, j][:, None, :] for j in range(n)],
        )
        return 0, fo.sub(fo.mul(v_index, s), fold)

    _, dvs = jax.lax.scan(body, 0, ws)  # [n, N, L]
    return fo.canon(jnp.moveaxis(dvs, 0, 1))  # [N, n, L] canonical


@jax.jit
def _gk_commit_device(comb_g, comb_h, v, r):
    """Batched Pedersen commits g*v + h*r on the comb fixed-base path,
    returned as canonical affine coordinates (for exact host unpacking).
    Replaces per-instance host double-mults (gk.ts:88-92)."""
    C = tom_ops.double_mul_comb_mixed(
        comb_g, fo.digits8_canonical(v), comb_h, fo.digits8_canonical(r)
    )
    x, y, _ = tom_ops.to_affine(C)
    return tom_ops.f.canon(x), tom_ops.f.canon(y)


@jax.jit
def gk_recombine_device(
    f: jnp.ndarray,  # [N, n, L] (response scalars)
    xf: jnp.ndarray,  # [N, n, L] (x - f)
    values: jnp.ndarray,  # [RING, L]
) -> jnp.ndarray:
    """total = sum_i v_i * prod_j (f_j if bit_j(i) else x-f_j): [N, L].
    Bitwise ring contraction (see _fold_ring) - 2*RING multiplies, peak
    [N, RING/2, L], vs the former per-element product's O(n*RING)
    multiplies over a full [N, RING, L] block (gk.ts:239-250)."""
    N, n = f.shape[0], f.shape[1]
    return fo.canon(
        _fold_ring(
            jnp.broadcast_to(values[None], (N,) + values.shape),
            [xf[:, j][:, None, :] for j in range(n)],
            [f[:, j][:, None, :] for j in range(n)],
        )
    )


def batch_prove_membership(
    params: PedersenParams,
    coms: Sequence[Commitment],
    indices: Sequence[int],
    initial_values: list[int],
    tapes: Sequence[rng.RandomSource],
    mesh=None,
    dev=None,
    timer=None,
) -> list[GKProof]:
    """Batched prover, bit-identical to gk.prove_membership per tape.
    With a ``mesh``, the instance batch is dp-sharded and the ring value
    vector replicated (the d-value evaluation is embarrassingly parallel
    over instances).  With ``dev`` (a ``protocol.batch.DeviceParams``),
    the 4n Pedersen commitments per instance run as ONE device comb-commit
    batch instead of 4n host double-mults each."""
    import contextlib

    stage = timer.stage if timer is not None else (
        lambda _n: contextlib.nullcontext()
    )
    c = params.c
    order = c.order
    N = len(coms)
    values_s = _pad(initial_values, c)
    RING, n = _ring_len(len(initial_values))

    # tape (reference order: per-bit ri, ai, si, ti, rho; gk.ts:112-123)
    ri = [[0] * n for _ in range(N)]
    ai = [[0] * n for _ in range(N)]
    si = [[0] * n for _ in range(N)]
    ti = [[0] * n for _ in range(N)]
    rho = [[0] * n for _ in range(N)]
    with stage("gk.tape"):
        for i, tape in enumerate(tapes):
            d = big.rnd_many([order] * (5 * n), tape)
            for j in range(n):
                (
                    ri[i][j], ai[i][j], si[i][j], ti[i][j], rho[i][j],
                ) = d[5 * j : 5 * j + 5]
    eli = [[(indices[i] >> j) & 1 for j in range(n)] for i in range(N)]

    # device d-values
    if n > 0:
        from ..parallel.mesh import (
            replicate,
            shard_batch,
            sharded_gk_dvalues,
        )

        # NOTE: when called from BatchProver.prove, the async phase-B
        # dispatch is still executing - gk.dvalues includes waiting out
        # the device queue behind it (the overlap is the point)
        with stage("gk.dvalues"):
            vals_np = jnp.asarray(fo.pack([v.k for v in values_s]))
            vidx_np = jnp.asarray(
                fo.pack([values_s[indices[i]].k for i in range(N)])
            )
            ai_np = jnp.asarray(
                fo.pack([a for row in ai for a in row])
            ).reshape(N, n, -1)
            eli_np = jnp.asarray(np.array(eli, dtype=np.int32))
            if _ring_sharded(mesh, RING):
                # config-5 shape: ring elements sharded over the ``ring``
                # axis (optionally x dp over instances on a 2D mesh)
                dp_ax = (
                    "dp"
                    if "dp" in mesh.shape and N % mesh.shape["dp"] == 0
                    else None
                )
                dv = sharded_gk_dvalues(
                    mesh, eli_np, ai_np, vals_np, vidx_np, dp_axis=dp_ax
                )
            else:
                dv = gk_dvalues_device(
                    shard_batch(mesh, eli_np),
                    shard_batch(mesh, ai_np),
                    replicate(mesh, vals_np),
                    shard_batch(mesh, vidx_np),
                )
            dv_ints = fo.unpack_canonical(dv)  # [N*n]
    else:
        dv_ints = []

    # interpolate (host; n x n per instance, tiny)
    omegas = list(range(n))
    di_all = [
        interpolate(omegas, dv_ints[i * n : (i + 1) * n], order)
        for i in range(N)
    ]

    # the 4n commitments per instance: one batched device comb-commit when
    # DeviceParams are available, host double-mults otherwise
    commit_pts: list[list] = [[] for _ in range(N)]
    if dev is not None and n > 0:
        with stage("gk.commits"):
            vals: list[int] = []
            blinds: list[int] = []
            for i in range(N):
                vals += eli[i]
                vals += ai[i]
                vals += [eli[i][j] * ai[i][j] % order for j in range(n)]
                vals += list(di_all[i])
                blinds += ri[i] + si[i] + ti[i] + rho[i]
            cx, cy = _gk_commit_device(
                jnp.asarray(dev.comb_g_tom),
                jnp.asarray(dev.comb_h_tom),
                jnp.asarray(fo.pack([v % order for v in vals])),
                jnp.asarray(fo.pack(blinds)),
            )
            xs = tom_ops.f.unpack_canonical(cx)
            ys = tom_ops.f.unpack_canonical(cy)
            for i in range(N):
                base = i * 4 * n
                commit_pts[i] = [
                    TEdwardsPoint(tomEdwards256, xs[base + t], ys[base + t])
                    for t in range(4 * n)
                ]
        # batched challenge x = H(cl || ca || cb || cd) per instance
        # (gk.ts:179-180; statement deliberately NOT hashed, quirk list
        # SURVEY 7.5) straight from the device affine bytes
        from .fiat_shamir import challenge_rows, point_bytes

        x_batch = challenge_rows(
            [point_bytes(tom_ops.f, cx, cy, 33).reshape(N, 4 * n * 67)]
        )

    # responses + proof assembly (host; small)
    _asm = stage("gk.assemble")
    _asm.__enter__()
    proofs = []
    for i in range(N):
        di = di_all[i]
        if dev is not None and n > 0:
            row = commit_pts[i]
            cl, ca = row[:n], row[n : 2 * n]
            cb, cd = row[2 * n : 3 * n], row[3 * n : 4 * n]
            x = gk_statement_bind(x_batch[i], coms[i].p, values_s)
        else:
            from ..proofGK.gk import _commit

            cl = [_commit(params, eli[i][j], ri[i][j]) for j in range(n)]
            ca = [_commit(params, ai[i][j], si[i][j]) for j in range(n)]
            cb = [
                _commit(params, eli[i][j] * ai[i][j], ti[i][j])
                for j in range(n)
            ]
            cd = [_commit(params, di[j], rho[i][j]) for j in range(n)]
            x = gk_statement_bind(
                hash_points(cl + ca + cb + cd), coms[i].p, values_s
            )
        f = [c.new_scalar((eli[i][j] * x + ai[i][j]) % order) for j in range(n)]
        za = [c.new_scalar((ri[i][j] * x + si[i][j]) % order) for j in range(n)]
        zb = [
            c.new_scalar((ri[i][j] * (x - f[j].k) + ti[i][j]) % order)
            for j in range(n)
        ]
        zd = coms[i].r.k * pow(x, n, order) % order
        for j in range(n):
            zd = (zd - rho[i][j] * pow(x, j, order)) % order
        proofs.append(GKProof(cl, ca, cb, cd, f, za, zb, c.new_scalar(zd)))
    _asm.__exit__(None, None, None)
    return proofs


def batch_verify_membership(
    params: PedersenParams,
    coms: Sequence,  # points
    initial_values: list[int],
    proofs: Sequence[GKProof],
) -> list[bool]:
    """Batched verifier: device ring recombination + (host) bit relations
    folded into per-instance MSMs."""
    from ..curves.multimult import MultiMult, Relation

    c = params.c
    order = c.order
    N = len(proofs)
    values_s = _pad(initial_values, c)
    RING, n = _ring_len(len(initial_values))

    xs, ok = [], [True] * N
    for i, proof in enumerate(proofs):
        if any(
            len(arr) != n
            for arr in (proof.cl, proof.ca, proof.cb, proof.cd, proof.f, proof.za, proof.zb)
        ):
            ok[i] = False
            xs.append(0)
        else:
            xs.append(gk_statement_bind(
                hash_points(proof.cl + proof.ca + proof.cb + proof.cd),
                coms[i], values_s,
            ))

    vals_dev = jnp.asarray(fo.pack([v.k for v in values_s]))
    f_ints = [
        [proofs[i].f[j].k if ok[i] else 0 for j in range(n)] for i in range(N)
    ]
    xf_ints = [
        [(xs[i] - f_ints[i][j]) % order for j in range(n)] for i in range(N)
    ]
    f_dev = jnp.asarray(fo.pack([v for row in f_ints for v in row])).reshape(N, n, -1)
    xf_dev = jnp.asarray(fo.pack([v for row in xf_ints for v in row])).reshape(N, n, -1)
    totals = fo.unpack_canonical(gk_recombine_device(f_dev, xf_dev, vals_dev))

    results = []
    for i, proof in enumerate(proofs):
        if not ok[i]:
            results.append(False)
            continue
        multi = MultiMult(c)
        multi.add_known(params.g)
        multi.add_known(params.h)
        aggregate_membership(params, coms[i], n, proof, xs[i], totals[i], multi)
        results.append(multi.evaluate().is_identity())
    return results


def aggregate_membership(params, com, n: int, proof: GKProof, x: int,
                         total: int, multi) -> None:
    """Drain the GK bit relations + final relation into ``multi``, given the
    (device-computed) ring recombination ``total`` (gk.ts:223-259).  Length
    checks are the caller's job."""
    from ..curves.multimult import Relation

    c = params.c
    order = c.order
    one = c.new_scalar(1)
    for j in range(n):
        rel0 = Relation(c)
        rel0.insert_m(
            [proof.cl[j], proof.ca[j], params.g, params.h],
            [c.new_scalar(x), one, proof.f[j].neg(), proof.za[j].neg()],
        )
        rel0.drain(multi)
        rel1 = Relation(c)
        rel1.insert_m(
            [proof.cl[j], proof.cb[j], params.h],
            [c.new_scalar((x - proof.f[j].k) % order), one, proof.zb[j].neg()],
        )
        rel1.drain(multi)
    rel_final = Relation(c)
    for j in range(n):
        rel_final.insert(proof.cd[j], c.new_scalar(-pow(x, j, order) % order))
    rel_final.insert(com, c.new_scalar(pow(x, n, order)))
    rel_final.insert_m(
        [params.g, params.h],
        [c.new_scalar(-total % order), proof.zd.neg()],
    )
    rel_final.drain(multi)
