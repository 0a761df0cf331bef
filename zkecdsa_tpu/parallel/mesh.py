"""Multi-chip sharding (SURVEY sections 2.3 / 5: the reference is
single-threaded; parallelism is a first-class component we add).

Axes of parallelism for ZKAttest on a TPU slice:

* ``dp``  - data parallelism over independent proof instances (the proof
  batch dimension).  Embarrassingly parallel; no collectives in the prove
  phases, psum only for verifier aggregates.
* ``ring`` - the scaling axis (SURVEY section 5 "long-context analog"):
  ring elements of the Groth-Kohlweiss recombination are sharded across
  chips and partial totals reduced with ``psum``; the same axis carries
  sharded MSM lanes for the batch verifier.

Everything uses `jax.sharding.Mesh` + `shard_map` with XLA collectives -
the TPU-native replacement for the "communication backend" row of the
survey.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.curve_ops import tom_ops
from ..ops.f32field import TOM_N

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "shard_batch",
    "replicate",
    "sharded_commit",
    "sharded_gk_total",
    "sharded_gk_dvalues",
    "sharded_gk_recombine",
    "sharded_msm",
]


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(dp: int, ring: int) -> Mesh:
    devs = np.asarray(jax.devices()[: dp * ring]).reshape(dp, ring)
    return Mesh(devs, ("dp", "ring"))


def shard_batch(mesh: Mesh | None, x: jnp.ndarray, axis: str = "dp"):
    """Place ``x`` with its leading (batch) dimension sharded over ``axis``
    and all other dims replicated.  No-op when ``mesh`` is None, so pipeline
    code can shard unconditionally.  The batch dim must divide evenly by the
    axis size - callers (BatchProver/BatchVerifier) require dp-divisible
    batches and raise otherwise; nothing is padded silently here."""
    if mesh is None:
        return x
    n = mesh.shape[axis]
    if x.shape[0] % n != 0:
        raise ValueError(
            f"batch dim {x.shape[0]} not divisible by mesh axis "
            f"'{axis}' size {n}; pad the batch"
        )
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(mesh: Mesh | None, tree):
    """Replicate every array leaf of a pytree across the mesh (the Pedersen
    base tables, ring value vectors, ... - operands every shard needs)."""
    if mesh is None:
        return tree
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sh), tree)


def sharded_commit(mesh: Mesh, dev_params, vals: jnp.ndarray, blinds: jnp.ndarray):
    """Pedersen commitments with the batch dimension sharded over ``dp``.
    Pure data parallelism: each chip commits its shard with the replicated
    base tables; no collectives."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P("dp"), P("dp")),
        out_specs=P("dp"),
    )
    def step(v, r):
        return dev_params.commit_tom(v, r, v_canon=True)

    return step(vals, blinds)


def sharded_gk_total(
    mesh: Mesh,
    f_or_xf: jnp.ndarray,  # [RING, n, L] per-element selected factors (mont)
    vec: jnp.ndarray,  # [RING, L] ring values (mont)
):
    """The GK verifier's O(N*n) ring recombination
    (reference src/proofGK/gk.ts:239-250) with ring elements sharded over
    the ``ring`` axis: each chip multiplies its shard's n factors and
    accumulates v_i * prod_j factor_ij; partial sums meet in one psum.

    Returns the total as a [L] Montgomery element (replicated)."""
    fo = TOM_N
    n = f_or_xf.shape[1]

    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P("ring"), P("ring")),
        out_specs=P(),
    )
    def step(factors, values):
        prod = factors[:, 0]
        for j in range(1, n):
            prod = fo.mul(prod, factors[:, j])
        terms = fo.mul(values, prod)
        # local tree-sum then cross-chip reduction; field addition is not
        # a jnp sum, so psum the *limb vectors* of partial sums modulo p
        # is invalid - instead reduce with our add via ppermute-free trick:
        # sum locally, then all_gather partials and fold.
        local = terms[0]
        for i in range(1, terms.shape[0]):
            local = fo.add(local, terms[i])
        gathered = jax.lax.all_gather(local, "ring")  # [n_dev, L]
        total = gathered[0]
        for i in range(1, gathered.shape[0]):
            total = fo.add(total, gathered[i])
        return total

    return step(f_or_xf, vec)


def _axis_spec(axis: str | None) -> P:
    return P(axis) if axis else P()


def sharded_gk_dvalues(
    mesh: Mesh,
    eli: jnp.ndarray,  # [N, n] int32 index bits (LSB first)
    ai: jnp.ndarray,  # [N, n, L]
    values: jnp.ndarray,  # [RING, L] padded ring (sharded over ``ring_axis``)
    v_index: jnp.ndarray,  # [N, L] values[which] per instance
    dp_axis: str | None = None,
    ring_axis: str = "ring",
) -> jnp.ndarray:
    """GK prover d-polynomial values [N, n, L] with RING ELEMENTS SHARDED
    (BASELINE config 5: ring 2^16 across hosts; the scaling axis of SURVEY
    section 5).  Each shard evaluates, per evaluation point w, the masked
    per-element product prod_j (bit_j(i) ? f1_j : f0_j) for ITS ring slice
    only (n multiplies per element instead of the single-device doubling
    table - the table would materialize [N, RING, L] on one chip), then
    partial sums meet in one all_gather fold per w.  Optionally dp-sharded
    over instances at the same time (2D mesh).  Bit-exact vs
    ``protocol.batch_gk.gk_dvalues_device`` (tests/test_mesh.py).
    Replaces the reference's sequential ring walk, gk.ts:135-171."""
    from ..ops.f32field import TOM_N
    from ..protocol.batch_gk import _fold_ring

    fo = TOM_N
    n = eli.shape[1]
    dspec = _axis_spec(dp_axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(dspec, dspec, P(ring_axis), dspec),
        out_specs=dspec,
    )
    def step(eli_s, ai_s, vals_s, vidx_s):
        localR = vals_s.shape[0]
        n_low = (localR - 1).bit_length()  # bits resolved inside the shard
        dev = jax.lax.axis_index(ring_axis)
        N_l = eli_s.shape[0]
        elib = eli_s[..., None] > 0  # [Nl, n, 1]
        ws = jnp.asarray(np.stack([fo.const(w) for w in range(n)]))

        def body(_, w_m):
            f0 = jnp.where(elib, fo.neg(ai_s), fo.sub(w_m, ai_s))  # [Nl,n,L]
            f1 = jnp.where(elib, fo.add(w_m, ai_s), ai_s)
            s = fo.add(f0[:, 0], f1[:, 0])  # sum_i p_i (replicated math)
            for j in range(1, n):
                s = fo.mul(s, fo.add(f0[:, j], f1[:, j]))
            # contract the LOCAL ring slice over the low index bits ...
            local = _fold_ring(
                jnp.broadcast_to(vals_s[None], (N_l,) + vals_s.shape),
                [f0[:, j][:, None, :] for j in range(n_low)],
                [f1[:, j][:, None, :] for j in range(n_low)],
            )
            # ... then apply the high-bit factors selected by THIS shard's
            # position on the ring axis (global i = dev * localR + r)
            for j in range(n_low, n):
                bit = ((dev >> (j - n_low)) & 1) > 0
                local = fo.mul(local, jnp.where(bit, f1[:, j], f0[:, j]))
            gathered = jax.lax.all_gather(local, ring_axis)  # [nd, Nl, L]
            tot = gathered[0]
            for k in range(1, gathered.shape[0]):
                tot = fo.add(tot, gathered[k])
            return 0, fo.sub(fo.mul(vidx_s, s), tot)

        _, dvs = jax.lax.scan(body, 0, ws)  # [n, Nl, L]
        return fo.canon(jnp.moveaxis(dvs, 0, 1))

    return step(eli, ai, values, v_index)


def sharded_gk_recombine(
    mesh: Mesh,
    f: jnp.ndarray,  # [N, n, L] response scalars
    xf: jnp.ndarray,  # [N, n, L] x - f
    values: jnp.ndarray,  # [RING, L] (sharded over ``ring_axis``)
    dp_axis: str | None = None,
    ring_axis: str = "ring",
) -> jnp.ndarray:
    """GK verifier ring recombination [N, L] with ring elements sharded
    (the O(RING * n) loop of gk.ts:239-250): per shard, masked products
    prod_j (bit_j(i) ? f_j : x-f_j) times v_i, local tree sum, one
    all_gather fold.  Bit-exact vs ``gk_recombine_device``."""
    from ..ops.f32field import TOM_N
    from ..protocol.batch_gk import _fold_ring

    fo = TOM_N
    n = f.shape[1]
    dspec = _axis_spec(dp_axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(dspec, dspec, P(ring_axis)),
        out_specs=dspec,
    )
    def step(f_s, xf_s, vals_s):
        localR = vals_s.shape[0]
        n_low = (localR - 1).bit_length()
        dev = jax.lax.axis_index(ring_axis)
        N_l = f_s.shape[0]
        local = _fold_ring(
            jnp.broadcast_to(vals_s[None], (N_l,) + vals_s.shape),
            [xf_s[:, j][:, None, :] for j in range(n_low)],  # bit 0 -> x-f
            [f_s[:, j][:, None, :] for j in range(n_low)],  # bit 1 -> f
        )
        for j in range(n_low, n):
            bit = ((dev >> (j - n_low)) & 1) > 0
            local = fo.mul(local, jnp.where(bit, f_s[:, j], xf_s[:, j]))
        gathered = jax.lax.all_gather(local, ring_axis)
        tot = gathered[0]
        for k in range(1, gathered.shape[0]):
            tot = fo.add(tot, gathered[k])
        return fo.canon(tot)

    return step(f, xf, values)


def sharded_msm(mesh: Mesh, ops, points: jnp.ndarray, digits: jnp.ndarray):
    """sum_i s_i * P_i with terms sharded over ``ring``: each chip runs the
    windowed multiplies for its shard and tree-reduces locally; the per-chip
    partial points are all-gathered and folded (group addition is not a
    psum-able monoid over raw limbs, so the fold happens in-kernel)."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P("ring"), P("ring")),
        out_specs=P(),
    )
    def step(pts, digs):
        local = ops.sum_reduce(ops.scalar_mul(pts, digs), axis=0)
        gathered = jax.lax.all_gather(local, "ring")  # [n_dev, C, L]
        acc = gathered[0]
        for i in range(1, gathered.shape[0]):
            acc = ops.add(acc, gathered[i])
        return acc

    return step(points, digits)
