"""Batched ZKAttest verifier - the TPU-native counterpart of
:mod:`zkecdsa_tpu.protocol.batch` (reference src/zkpAttestList.ts:147-184,
src/exp/exp.ts:233-349 run per proof; here one device pipeline verifies a
whole batch).

Phase structure:

* host: structural checks, Fiat-Shamir challenge recomputation, the random
  20-of-80 round sample (exp.ts:95-109), GK challenge hashes;
* device phase V (batched): Q = z1*G, the sampled rounds' T = m*R (m =
  alpha for challenge-bit-1 rounds, z for bit-0), T1 = T + Q, one affine
  pass, and the bit-0 T1x/T1y coordinate commitments - replacing the
  ~60 sequential host scalar-mults per proof of the scalar verifier;
* host: relation assembly (exact reference algebra: equality/mult/pointAdd
  aggregations, GK bit relations + device ring recombination) into one
  MultiMult per (proof, curve);
* device MSM: every proof's accumulated pairs evaluated with the Straus
  shared-window ``msm_shared`` kernel ([N, T] term lanes, chunked only
  when the window tables would exceed the HBM budget), identity-checked
  on device.

Semantics match ``verify_signature_list`` per instance, with one
difference: structural errors that make the scalar verifier *raise*
(missing optional ExpProof fields, points at infinity, secparam >
len(expProof)) mark just that instance False here - a batch must not die
on one malformed proof.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..bignum import big
from ..curves.group import Group, Point, hash_points
from ..curves.instances import p256
from ..curves.multimult import MultiMult
from ..exp.exp import generate_indices, padded_bits
from ..exp.pointAdd import aggregate_point_add
from ..ops.curve_ops import TABLE, nibble_digits, p256_ops, tom_ops, war_ops
from ..ops.f32field import TOM_N
from ..proofGK.gk import _pad, gk_statement_bind
from ..zkp_attest_list import SignatureProofList, SystemParametersList, _truncate_to_n
from .batch import (
    _bytes_host,
    _digits_host,
    _nist_pt,
    _pk_scalars,
    _tom_pt,
    _unp,
    device_params_for,
)
from .batch_gk import (
    _ring_len,
    _ring_sharded,
    aggregate_membership,
    gk_recombine_device,
)

__all__ = ["BatchVerifier", "batch_verify_signature_list"]

def _verify_rounds() -> int:
    """Top-level verifier spot-check count.  The reference hardcodes 20
    (zkpAttestList.ts:177); configurable here via Config.verify_rounds /
    ZKECDSA_VERIFY_ROUNDS, defaulting to the reference's quirk."""
    from ..utils.config import get_config

    return get_config().verify_rounds

_OPS = {"p256": p256_ops, "tomEdwards256": tom_ops, "war256": war_ops}


fw = p256_ops.f
ft = tom_ops.f


def _vphase_fn(dev):
    """The jitted verifier phase (module-level, params-independent: the
    base tables arrive as the ``tabs`` operand, see batch.py)."""
    return _VPHASE


def vphase(tabs, R, z1d, md, bits, rb):
    """R [N,3,L] packed P-256 points; z1d [N,64] digits; md [N,S,64]
    digits (alpha or z per sampled round); bits [N,S] bool; rb
    [N,S,2,L] Tom-order blinding limbs (std, uint8-shipped).  Everything
    the exp verifier needs from the device in one pass."""
    rb = rb.astype(jnp.float32)
    # Q = z1*G and the S sampled rounds' T = m*R in ONE windowed-mul
    # scan [N, S+1] (row 0 selects the G table, rows 1..S the per-proof
    # R table) - each scan body costs ~6k HLO ops, so merging matters
    # for compile time (VERDICT r2 weak #4)
    S = md.shape[1]
    tab_R = p256_ops.table(R)
    is_q_row = (
        jax.lax.broadcasted_iota(jnp.int32, (S + 1, 1, 1, 1), 0) == 0
    )
    tabs_sel = jnp.where(is_q_row, tabs["G"], tab_R[:, None])
    qt = p256_ops.scalar_mul_table(
        tabs_sel, jnp.concatenate([z1d[:, None], md], axis=1)
    )  # [N, S+1, 3, L]
    Q, T0 = qt[:, 0], qt[:, 1:]
    T1 = p256_ops.add(T0, Q[:, None])  # bit-0: T1 = z*R + Q
    Tc = p256_ops.select(bits, T0, T1)  # coordinate source
    st = jnp.stack([T0, Tc], axis=-3)  # [N,S,2,3,L]
    x, y, inf = p256_ops.to_affine(st)
    # canon: canonical digits feed the fast window-digit path below
    # and the vectorized host unpack.  Committing the REDUNDANT affine
    # output through the canonical fast path was half of the r2
    # regression (the prover's TC commit was the other half).
    x, y = fw.canon(x), fw.canon(y)
    sx, sy = x[..., 1, :], y[..., 1, :]
    com = tom_ops.double_mul_comb_mixed(
        tabs["g_t8"], _bytes_host(TOM_N, jnp.stack([sx, sy], axis=-2)),
        tabs["h_t8"], _bytes_host(TOM_N, rb),
    )  # [N,S,2,4,L]
    cx, cy, _ = tom_ops.to_affine(com)
    cx, cy = ft.canon(cx), ft.canon(cy)
    # canonical digits < 128 ship exactly as uint8: 4x less transfer
    u8 = lambda v: v.astype(jnp.uint8)  # noqa: E731
    return {
        "T0_aff": (u8(x[..., 0, :]), u8(y[..., 0, :]), inf[..., 0]),
        "coord": (u8(sx), u8(sy), inf[..., 1]),
        "com_aff": (u8(cx), u8(cy)),
    }

# one compiled program per batch shape (see batch.py::_phase_fns)
_VPHASE = jax.jit(vphase)


@functools.lru_cache(maxsize=16)
def _msm_rows_fn(group_name: str, T: int):
    ops = _OPS[group_name]

    def rows(points, digits):
        # operands arrive uint8 (canonical digits < 128, nibble digits
        # < 16): 4x less host->device transfer through the tunnel than
        # f32 (msm.upload was 8% of the round-5 wall); cast on device
        return ops.is_identity(
            ops.msm_shared(
                points.astype(jnp.float32), digits.astype(jnp.int32)
            )
        )

    return jax.jit(rows)


# HBM budget for one msm_shared chunk.  Peak live memory is ~2x the
# [N, T, 16, C, L] window table (the scan carries the table plus the
# per-column gathered terms and tree-reduce temporaries), so the chunker
# charges 2x the table size against this budget (advisor r1 item).
# 2 GiB: ~4 GiB peak on a 16 GiB v5e, leaving headroom for the resident
# phase tables - fewer, fatter dispatches than the former 512 MiB budget.
MSM_TABLE_BYTES = 1 << 31


def _batched_msm_identity(
    group: Group,
    rows: list[tuple[list[Point], list[int]]],
    mesh=None,
    t_static: int | None = None,
    timer=None,
) -> np.ndarray:
    """One device dispatch (chunked only when live memory would blow the
    HBM budget): is Σ s_i P_i the identity, per row?  Rows are padded with
    (identity, 0) to a shared static length.  With a ``mesh`` the
    row batch is dp-sharded (each device holds only its shard's rows, so
    the HBM budget scales by the dp size).

    ``t_static``: a challenge-INDEPENDENT worst-case term bound computed
    from the proof structure (ring size + verify rounds, see
    :meth:`BatchVerifier._t_static`).  Production batches always land on
    this one compiled shape - a tighter fit than the power-of-two ladder
    (~25% fewer Straus lanes at ring 2^12) with no recompile exposure,
    honoring the round-4 shape-stability lesson: a tmax-derived
    multiple-of-128 rounding made consecutive batches land on different
    T buckets and pay a fresh multi-minute MSM compile each (chip run:
    verify.msm 4.5 s -> 72.5 s).  Small batches (tmax <= t_static/2,
    e.g. unit tests at tiny rings) keep the power-of-two ladder so they
    don't compile worst-case-sized kernels; rows beyond the bound (only
    possible past the ~P99.99 challenge tail) fall back to a
    power-of-two dispatch for just the overflowing rows.

    Backend dispatch: the Straus shared-window kernel (``msm_shared``) by
    default; the bucket kernel (``msm_pippenger_rows``, no [T, 16] window
    table) when T reaches ``Config.pippenger_min_t`` - threshold measured
    on-chip (tools/msm_crossover.py)."""
    from ..parallel.mesh import shard_batch
    from ..utils.config import get_config

    ops = _OPS[group.name]
    N = len(rows)
    if N == 0:
        return np.zeros(0, dtype=bool)
    tmax = max((len(p) for p, _ in rows), default=1)
    if t_static is not None and tmax > t_static // 2:
        T = t_static
    else:
        T = 1 << max(5, (tmax - 1).bit_length())
    if tmax > T:  # t_static overflow: split off the oversized rows
        over = [i for i, (p, _) in enumerate(rows) if len(p) > T]
        fit = [
            (p, s) if len(p) <= T else ([], []) for (p, s) in rows
        ]
        ok = _batched_msm_identity(group, fit, mesh=mesh, t_static=t_static)
        ok_over = _batched_msm_identity(
            group, [rows[i] for i in over]
        )
        for k, i in enumerate(over):
            ok[i] = ok_over[k]
        return ok
    # pack only the REAL points; padding lanes (~40% at T=1024) are all
    # the identity, filled from one precomputed packed row instead of
    # going through pack_points per point (the per-point host pack was a
    # visible slice of the verify.msm stage at N=256)
    import contextlib

    stage = timer.stage if timer is not None else (
        lambda _n: contextlib.nullcontext()
    )
    with stage("msm.pack_host"):
        real: list[Point] = []
        scs: list[int] = []
        for p, s in rows:
            real.extend(p)
            scs.extend(s)
            scs.extend([0] * (T - len(s)))
        # uint8 wire: host-packed points are canonical digits < 128
        arr_np = np.broadcast_to(
            ops.pack_points([group.identity()])[0].astype(np.uint8),
            (N * T, ops.NCOORD, ops.f.nlimbs),
        ).copy()
        if real:
            packed_real = ops.pack_points(real).astype(np.uint8)
            pos = np.concatenate(
                [np.arange(len(p)) + i * T for i, (p, _) in enumerate(rows)]
            ).astype(np.int64)
            arr_np[pos] = packed_real
    with stage("msm.upload"):
        arr = jax.block_until_ready(
            jnp.asarray(arr_np).reshape(N, T, ops.NCOORD, ops.f.nlimbs)
        )
    min_t = get_config().pippenger_min_t
    use_pip = bool(min_t) and T >= min_t
    point_row = T * ops.NCOORD * ops.f.nlimbs * 4
    # Straus: ~2x the 16-entry window table; bucket: ~4x the point row
    # (sorted gather + Hillis-Steele temporaries), no table
    row_bytes = 4 * point_row if use_pip else 2 * TABLE * point_row
    ndev = mesh.shape["dp"] if mesh is not None else 1
    chunk = max(1, min(N, ndev * MSM_TABLE_BYTES // row_bytes))
    if mesh is not None:
        # keep chunks dp-divisible so every shard stays even
        chunk = max(ndev, chunk - chunk % ndev)
    if use_pip:
        ispot = jax.jit(ops.is_identity)
        out = []
        for i in range(0, N, chunk):
            a = arr[i : i + chunk]
            srows = [scs[j * T : (j + 1) * T] for j in range(i, min(i + chunk, N))]
            if mesh is not None and a.shape[0] % ndev == 0:
                a = shard_batch(mesh, a)
            out.append(np.asarray(ispot(ops.msm_pippenger_rows(a, srows))))
        return np.concatenate(out)
    with stage("msm.digits"):
        digits = jnp.asarray(
            nibble_digits(scs).astype(np.uint8).reshape(N, T, 64)
        )
    fn = _msm_rows_fn(group.name, T)
    out = []
    with stage("msm.device"):
        for i in range(0, N, chunk):
            a, d = arr[i : i + chunk], digits[i : i + chunk]
            if mesh is not None and a.shape[0] % ndev == 0:
                a, d = shard_batch(mesh, a), shard_batch(mesh, d)
            out.append(np.asarray(fn(a, d)))
    return np.concatenate(out)


_COMB_W = 8192  # combined-MSM sub-row width (see _combined_msm_identity)


def _combined_msm_identity(
    group: Group,
    rows: list[tuple[list[Point], list[int]]],
    mesh=None,
    t_static: int | None = None,
    timer=None,
) -> np.ndarray:
    """Hierarchical batch identity check.

    Every row already sums to the identity for a valid proof, so one MORE
    random-linear-combination level collapses the whole batch: scale row
    i's scalars by a fresh verifier-internal random r_i, concatenate all
    pairs, and evaluate ONE combined MSM over wide static sub-rows
    (identity-padded to a multiple of _COMB_W lanes; the sub-row sums add
    up on device and the total is identity-checked).  If any row were
    non-identity, the combined sum survives with probability
    1 - 1/order (same soundness argument as Relation.drain,
    multimult.ts:147-174).  Honest batches - the common case - therefore
    pay ~79 * total_real_terms Straus adds instead of
    ~79 * N * padded_row_T (~1.6x less at ring 2^12: rows average ~450
    of the 760-lane worst-case bound).  Only on a combined-check failure
    does the per-row dispatch run to attribute the failure - a deliberate
    latency trade against adversarial batches."""
    import contextlib

    from ..bignum import big as _big

    stage = timer.stage if timer is not None else (
        lambda _n: contextlib.nullcontext()
    )
    N = len(rows)
    if N == 0:
        return np.zeros(0, dtype=bool)
    ops = _OPS[group.name]
    order = group.order
    total = sum(len(p) for p, _ in rows)
    # the combined path wins only when the batch is big enough to fill
    # its fixed [4, W] dispatch blocks (shape stability: one compiled
    # shape, ever); small batches keep the per-row path
    if total < 4 * _COMB_W:
        return _batched_msm_identity(
            group, rows, mesh=mesh, t_static=t_static, timer=timer
        )
    with stage("msm.combine_host"):
        pts: list[Point] = []
        scs: list[int] = []
        for p, s in rows:
            r = _big.rnd(order)
            pts.extend(p)
            scs.extend(r * v % order for v in s)
        k = 4 * -(-total // (4 * _COMB_W))  # sub-rows, multiple of 4
        pad = k * _COMB_W - total
        arr_np = np.empty(
            (k * _COMB_W, ops.NCOORD, ops.f.nlimbs), np.uint8
        )
        arr_np[:total] = ops.pack_points(pts).astype(np.uint8)
        arr_np[total:] = ops.pack_points([group.identity()])[0].astype(
            np.uint8
        )
        scs.extend([0] * pad)
    with stage("msm.upload"):
        arr = jax.block_until_ready(
            jnp.asarray(arr_np).reshape(k, _COMB_W, ops.NCOORD, ops.f.nlimbs)
        )
    with stage("msm.digits"):
        digits = jnp.asarray(
            nibble_digits(scs).astype(np.uint8).reshape(k, _COMB_W, 64)
        )
    with stage("msm.device"):
        # fixed [4, W] dispatch blocks; partial sums combine on device
        acc = None
        fn = _msm_sum_fn(group.name)
        for i in range(0, k, 4):
            part = fn(arr[i : i + 4], digits[i : i + 4])
            acc = part if acc is None else ops.add(acc, part)
        all_ok = bool(np.asarray(ops.is_identity(acc)))
    if all_ok:
        return np.ones(N, dtype=bool)
    # attribution path: some row failed - fall back to per-row checks
    return _batched_msm_identity(
        group, rows, mesh=mesh, t_static=t_static, timer=timer
    )


@functools.lru_cache(maxsize=16)
def _msm_sum_fn(group_name: str):
    ops = _OPS[group_name]

    def rows(points, digits):
        parts = ops.msm_shared(
            points.astype(jnp.float32), digits.astype(jnp.int32)
        )  # [k, C, L]
        return ops.sum_reduce(parts, axis=0)

    return jax.jit(rows)


class BatchVerifier:
    """Verifies batches of ``SignatureProofList`` against one parameter set
    and one ring.  Pass a ``jax.sharding.Mesh`` with a ``dp`` axis to shard
    the proof batch across devices (vphase, GK recombination and the final
    identity-check MSMs all partition over the batch dim; the batch must be
    divisible by the ``dp`` size)."""

    def __init__(self, params: SystemParametersList, mesh=None) -> None:
        self.params = params
        self.dev = device_params_for(params)
        if mesh is not None and "dp" not in mesh.shape:
            raise ValueError(
                "BatchVerifier shards the proof batch over a 'dp' mesh axis; "
                f"got mesh axes {tuple(mesh.shape)} - build the mesh with "
                "parallel.mesh.make_mesh() or make_mesh_2d()"
            )
        self.mesh = mesh
        from ..parallel.mesh import replicate

        self.tabs = replicate(mesh, self.dev.tabs())
        self.vphase = _vphase_fn(self.dev)

    # Largest sub-batch one verify pass handles; beyond it the batch
    # chunks transparently (proofs are independent) so config-4 batch
    # sizes reuse the compiled 256-instance programs instead of paying
    # fresh vphase/recombine compiles per batch size.
    MAX_CHUNK = 256

    def verify(
        self,
        msg_hashes: Sequence[bytes],
        keys: list[int],
        proofs: Sequence[SignatureProofList],
        timer=None,
    ) -> list[bool]:
        import contextlib

        N_all = len(proofs)
        if N_all > self.MAX_CHUNK:
            step = self.MAX_CHUNK
            if self.mesh is not None:
                dp = self.mesh.shape["dp"]
                step = max(dp, step - step % dp)
            out: list[bool] = []
            for lo in range(0, N_all, step):
                hi = min(lo + step, N_all)
                out.extend(self.verify(
                    msg_hashes[lo:hi], keys, proofs[lo:hi], timer=timer
                ))
            return out

        stage = timer.stage if timer is not None else (lambda _n: contextlib.nullcontext())
        params = self.params
        N = len(proofs)
        if N == 0:
            return []  # empty batch: nothing to pack/reshape (advisor r1)
        S = _verify_rounds()
        n_ord = p256.order
        pg = params.proof_group
        fo = TOM_N

        ok = [True] * N
        # ---- host: parse + challenges + round sampling ----
        with stage("verify.host_prep"):
            from ..runtime import native

            # all exp challenges in one threaded hash batch (the messages
            # are serialized proof points; exp.ts:260 recomputation)
            msgs = []
            for proof in proofs:
                try:
                    parts = [proof.keyXcom.to_bytes(), proof.keyYcom.to_bytes()]
                    for p in proof.expProof:
                        parts += [p.A.to_bytes(), p.Tx.to_bytes(), p.Ty.to_bytes()]
                    msgs.append(b"".join(parts))
                except Exception:
                    msgs.append(b"")
            digests = native.sha256_batch(msgs)
            z1s = [0] * N
            m_sc = [[0] * S for _ in range(N)]
            rb = [[(0, 0)] * S for _ in range(N)]
            sel_idx = [[0] * S for _ in range(N)]
            sel_bit = [[True] * S for _ in range(N)]
            for i, proof in enumerate(proofs):
                pi = proof.expProof
                coordR = proof.R.to_affine()
                if coordR is None or S > len(pi):
                    ok[i] = False
                    continue
                z = _truncate_to_n(big.from_bytes(msg_hashes[i]), n_ord)
                rinv = big.inv_mod(coordR[0], n_ord)
                z1s[i] = rinv * z % n_ord
                challenge = big.from_bytes(digests[i][:10])
                indices = generate_indices(S, len(pi))
                bits = padded_bits(challenge, len(pi))
                for j in range(S):
                    r_i = indices[j]
                    rp = pi[r_i]
                    sel_idx[i][j] = r_i
                    sel_bit[i][j] = bits[r_i]
                    if bits[r_i]:
                        if not (rp.alpha and rp.beta1 and rp.beta2 and rp.beta3):
                            ok[i] = False
                            break
                        m_sc[i][j] = rp.alpha.k
                    else:
                        if not (rp.z and rp.z2 and rp.proof and rp.r1 and rp.r2):
                            ok[i] = False
                            break
                        m_sc[i][j] = rp.z.k
                        rb[i][j] = (rp.r1.k, rp.r2.k)

        # ---- device phase V ----
        from ..parallel.mesh import replicate, shard_batch

        mesh = self.mesh
        with stage("verify.device"):
            R_dev = shard_batch(
                mesh, jnp.asarray(p256_ops.pack_points([p.R for p in proofs]))
            )
            z1d = shard_batch(mesh, jnp.asarray(nibble_digits(z1s)))
            md = shard_batch(
                mesh,
                jnp.asarray(
                    nibble_digits([m for row in m_sc for m in row]).reshape(N, S, 64)
                ),
            )
            bitmask = shard_batch(mesh, jnp.asarray(np.array(sel_bit, dtype=bool)))
            rb_arr = shard_batch(
                mesh,
                _pk_scalars(
                    fo, [v for row in rb for pair in row for v in pair]
                ).reshape(N, S, 2, -1),
            )
            v = self.vphase(self.tabs, R_dev, z1d, md, bitmask, rb_arr)

        with stage("verify.unpack"):
            # bit-dependent masking: the sampled round's affine coords feed
            # relTx/relTy only on challenge-bit-1 rounds, the T1x/T1y
            # commitments only bit-0 rounds - unpack each only where used
            bmask = np.asarray(sel_bit)  # [N, S]
            pos1 = np.full((N, S), -1, np.int64)
            pos1[bmask] = np.arange(int(bmask.sum()))
            pos0 = np.full((N, S), -1, np.int64)
            pos0[~bmask] = np.arange(int((~bmask).sum()))
            t0x = _unp(p256_ops.f, v["T0_aff"][0])  # [N*S]
            t0y = _unp(p256_ops.f, v["T0_aff"][1])
            t0inf = np.asarray(v["T0_aff"][2]).reshape(N, S)
            sxs = _unp(fo, np.asarray(v["coord"][0]).reshape(N, S, -1)[bmask])
            sys_ = _unp(fo, np.asarray(v["coord"][1]).reshape(N, S, -1)[bmask])
            cinf = np.asarray(v["coord"][2]).reshape(N, S)
            comx = _unp(
                tom_ops.f, np.asarray(v["com_aff"][0]).reshape(N, S, 2, -1)[~bmask]
            )
            comy = _unp(
                tom_ops.f, np.asarray(v["com_aff"][1]).reshape(N, S, 2, -1)[~bmask]
            )

        # ---- GK: device ring recombination for all proofs ----
        with stage("verify.gk_recombine"):
            values_s = _pad(keys, pg.c)
            RING, n = _ring_len(len(keys))
            gk_x = [0] * N
            for i, proof in enumerate(proofs):
                mp = proof.membershipProof
                if not ok[i]:
                    continue
                if any(
                    len(arr) != n
                    for arr in (mp.cl, mp.ca, mp.cb, mp.cd, mp.f, mp.za, mp.zb)
                ):
                    ok[i] = False
                    continue
                gk_x[i] = gk_statement_bind(
                    hash_points(mp.cl + mp.ca + mp.cb + mp.cd),
                    proof.keyXcom, values_s,
                )
            t_ord = pg.c.order
            f_ints = [
                [proofs[i].membershipProof.f[j].k if ok[i] else 0 for j in range(n)]
                for i in range(N)
            ]
            xf_ints = [
                [(gk_x[i] - f_ints[i][j]) % t_ord for j in range(n)]
                for i in range(N)
            ]
            vals_np = jnp.asarray(fo.pack([v_.k for v_ in values_s]))
            f_np = jnp.asarray(
                fo.pack([x for row in f_ints for x in row])
            ).reshape(N, n, -1)
            xf_np = jnp.asarray(
                fo.pack([x for row in xf_ints for x in row])
            ).reshape(N, n, -1)
            if _ring_sharded(mesh, RING) and n > 0:
                from ..parallel.mesh import sharded_gk_recombine

                dp_ax = (
                    "dp"
                    if "dp" in mesh.shape and N % mesh.shape["dp"] == 0
                    else None
                )
                tot_dev = sharded_gk_recombine(
                    mesh, f_np, xf_np, vals_np, dp_axis=dp_ax
                )
            else:
                tot_dev = gk_recombine_device(
                    shard_batch(mesh, f_np),
                    shard_batch(mesh, xf_np),
                    replicate(mesh, vals_np),
                )
            totals = fo.unpack_canonical(tot_dev)

        # ---- host: relation assembly per proof ----
        with stage("verify.assemble"):
            rows_w: list[tuple[list[Point], list[int]]] = []
            rows_n: list[tuple[list[Point], list[int]]] = []
            for i, proof in enumerate(proofs):
                if not ok[i]:
                    rows_w.append(([], []))
                    rows_n.append(([], []))
                    continue
                multiW = MultiMult(pg.c)
                multiW.add_known(pg.g)
                multiW.add_known(pg.h)
                multiN = MultiMult(p256)
                multiN.add_known(proof.R)
                multiN.add_known(params.nist_group.h)
                multiN.add_known(proof.comS1)
                aggregate_membership(
                    pg, proof.keyXcom, n, proof.membershipProof, gk_x[i],
                    totals[i], multiW,
                )
                if not self._aggregate_exp(
                    proof, i, multiW, multiN,
                    sel_idx[i], sel_bit[i],
                    t0x, t0y, t0inf, sxs, sys_, cinf, comx, comy,
                    pos0, pos1,
                ):
                    ok[i] = False
                    rows_w.append(([], []))
                    rows_n.append(([], []))
                    continue
                rows_w.append(multiW.pairs())
                rows_n.append(multiN.pairs())

        # ---- device MSMs (one dispatch per curve); sub-stages msm.* ----
        t_w, t_n = self._t_static(n, S)
        ok_w = _combined_msm_identity(
            pg.c, rows_w, mesh=mesh, t_static=t_w, timer=timer
        )
        ok_n = _combined_msm_identity(
            p256, rows_n, mesh=mesh, t_static=t_n, timer=timer
        )
        return [bool(ok[i] and ok_w[i] and ok_n[i]) for i in range(N)]

    @staticmethod
    def _t_static(n: int, S: int) -> tuple[int, int]:
        """Challenge-independent MSM term bounds per proof row, derived
        from the aggregation structure (so every production batch lands on
        ONE compiled MSM shape; see _batched_msm_identity).

        Proof-group row (after MultiMult's identity merging): g + h +
        keyXcom + GK (cl/ca/cb/cd per index bit = 4n) + per sampled exp
        round either 2 (bit-1: Tx-, Ty-) or 37 (bit-0: the point-add
        aggregation's distinct commitment/nonce points, pointAdd.ts:
        199-259).  The bound covers up to S-1 bit-0 rounds (the all-zeros
        challenge tail, ~2^-S per row, overflows to the fallback split).
        NIST row: R + h_n + comS1 + 2 per round (T/T1 + A-)."""
        t_w = 3 + 4 * n + 2 * S + 35 * max(S - 1, 0)
        t_n = 3 + 2 * S
        rnd8 = lambda v: -(-v // 8) * 8  # noqa: E731
        return rnd8(t_w), rnd8(t_n)

    def _aggregate_exp(
        self, proof, i, multiW, multiN,
        idxs, bits, t0x, t0y, t0inf, sxs, sys_, cinf, comx, comy,
        pos0, pos1,
    ) -> bool:
        """Exp relations for the sampled rounds, using the device-computed
        points (exp.ts:263-346 algebra, host scalar arithmetic)."""
        from ..curves.multimult import Relation

        params = self.params
        pg = params.proof_group
        pi = proof.expProof
        S = _verify_rounds()
        one_n = p256.new_scalar(1)
        one_w = pg.c.new_scalar(1)
        h_n = params.nist_group.h
        # indices were stored per sampled slot; recompute base offset
        for j in range(S):
            k = i * S + j
            rp = pi[idxs[j]]
            if cinf[i, j]:
                return False  # T (or T1) at infinity
            if bits[j]:
                k1 = pos1[i, j]  # bit-1 row in the masked coord arrays
                sx = pg.c.new_scalar(sxs[k1])
                sy = pg.c.new_scalar(sys_[k1])
                T = _nist_pt(t0x[k], t0y[k]) if not t0inf[i, j] else p256.identity()
                relA = Relation(p256)
                relA.insert_m(
                    [T, h_n, rp.A.neg()], [one_n, rp.beta1, one_n]
                )
                relA.drain(multiN)
                relTx = Relation(pg.c)
                relTx.insert_m(
                    [pg.g, pg.h, rp.Tx.neg()], [sx, rp.beta2, one_w]
                )
                relTx.drain(multiW)
                relTy = Relation(pg.c)
                relTy.insert_m(
                    [pg.g, pg.h, rp.Ty.neg()], [sy, rp.beta3, one_w]
                )
                relTy.drain(multiW)
            else:
                T1 = (
                    _nist_pt(t0x[k], t0y[k])
                    if not t0inf[i, j]
                    else p256.identity()
                )
                relA = Relation(p256)
                relA.insert_m(
                    [T1, proof.comS1, rp.A.neg(), h_n],
                    [one_n, one_n, one_n, rp.z2],
                )
                relA.drain(multiN)
                k0 = pos0[i, j]  # bit-0 row in the masked commit arrays
                T1x = _tom_pt(comx[k0 * 2], comy[k0 * 2])
                T1y = _tom_pt(comx[k0 * 2 + 1], comy[k0 * 2 + 1])
                if not aggregate_point_add(
                    pg, T1x, T1y, proof.keyXcom, proof.keyYcom,
                    rp.Tx, rp.Ty, rp.proof, multiW,
                ):
                    return False
        return True


def batch_verify_signature_list(
    params: SystemParametersList,
    msg_hashes: Sequence[bytes],
    keys: list[int],
    proofs: Sequence[SignatureProofList],
) -> list[bool]:
    return BatchVerifier(params).verify(msg_hashes, keys, proofs)
