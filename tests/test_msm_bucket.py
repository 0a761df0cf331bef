"""The vectorized Pippenger bucket MSM (ops/msm_bucket.py) vs the host
MultiMult-style naive sum - including zero/one/duplicate scalars, the
concentrated top window of non-byte-aligned widths, and the layout
invariants (VERDICT r4 next #5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zkecdsa_tpu.curves.instances import tomEdwards256 as g
from zkecdsa_tpu.ops.curve_ops import tom_ops
from zkecdsa_tpu.ops.msm_bucket import bucket_layout, msm_bucket_rows


def _rows(rs, N, T):
    rows_pts, rows_sc, want = [], [], []
    for _ in range(N):
        pts = [
            g.generator().mul(g.new_scalar(int(rs.randint(2, 1 << 30))))
            for _ in range(T)
        ]
        sc = [
            int.from_bytes(rs.bytes(32), "big") % g.order for _ in range(T - 3)
        ] + [0, 1, g.order - 1]
        acc = g.identity()
        for p, s in zip(pts, sc):
            acc = acc.add(p.mul(g.new_scalar(s)))
        rows_pts.append(tom_ops.pack_points(pts))
        rows_sc.append(sc)
        want.append(acc)
    return jnp.asarray(np.stack(rows_pts)), rows_sc, want


@pytest.mark.parametrize("window", [5, 6])
def test_bucket_msm_matches_host(window):
    rs = np.random.RandomState(11)
    arr, scal, want = _rows(rs, 2, 48)
    out = msm_bucket_rows(tom_ops, arr, scal, window=window)
    got = tom_ops.unpack_points(np.asarray(out))
    for w, o in zip(want, got):
        assert o.eq(w)


def test_bucket_layout_invariants():
    rs = np.random.RandomState(12)
    T, window = 96, 5
    scal = [[int.from_bytes(rs.bytes(32), "big") % g.order for _ in range(T)]]
    chunk_idx, bucket_chunks, (B, D, R, M, K, w) = bucket_layout(
        scal, T, window
    )
    assert w == window and B == 32 and D == -(-256 // window)
    # every non-pad chunk entry is a valid term index, each term appears
    # exactly once per window across chunks (minus bucket-0 terms)
    for d in range(D):
        used = chunk_idx[0, d][chunk_idx[0, d] < T]
        digs = [(s >> ((D - 1 - d) * window)) & (B - 1) for s in scal[0]]
        nonzero = [t for t, dig in enumerate(digs) if dig != 0]
        assert sorted(used.tolist()) == sorted(nonzero)
        # bucket_chunks rows point at chunk rows or the pad row R
        assert bucket_chunks[0, d].max() <= R
