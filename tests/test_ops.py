"""Numerical tests for the segment / graph / geometry kernels."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from superpoint_transformer_tpu.ops import segment as seg
from superpoint_transformer_tpu.ops.graph import (
    edges_to_dense_neighbors, untrim_edges_np, to_trimmed_np,
    add_self_loops_np, forward_star_np)
from superpoint_transformer_tpu.ops.geometry import (
    eigh_3x3, geometric_features)


def test_segment_ops_vs_numpy():
    rng = np.random.default_rng(0)
    n, m = 500, 37
    idx = np.sort(rng.integers(0, m, n))
    x = rng.normal(size=(n, 4)).astype(np.float32)
    s = seg.segment_sum(jnp.asarray(x), jnp.asarray(idx), m,
                        indices_are_sorted=True)
    mean = seg.segment_mean(jnp.asarray(x), jnp.asarray(idx), m,
                            indices_are_sorted=True)
    std = seg.segment_std(jnp.asarray(x), jnp.asarray(idx), m,
                          indices_are_sorted=True)
    for g in range(m):
        rows = x[idx == g]
        if rows.shape[0] == 0:
            continue
        np.testing.assert_allclose(s[g], rows.sum(0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(mean[g], rows.mean(0), rtol=1e-5,
                                   atol=1e-5)
        if rows.shape[0] > 1:
            np.testing.assert_allclose(
                std[g], rows.std(0, ddof=1), rtol=1e-4, atol=1e-4)


def test_segment_softmax():
    rng = np.random.default_rng(1)
    n, m = 300, 20
    idx = rng.integers(0, m, n)
    x = rng.normal(size=(n, 3)).astype(np.float32) * 5
    p = np.asarray(seg.segment_softmax(jnp.asarray(x), jnp.asarray(idx), m))
    # sums to one per segment per column
    sums = np.zeros((m, 3))
    np.add.at(sums, idx, p)
    present = np.bincount(idx, minlength=m) > 0
    np.testing.assert_allclose(sums[present], 1.0, atol=1e-5)
    # matches naive softmax per group
    for g in [0, 5, 19]:
        rows = x[idx == g]
        e = np.exp(rows - rows.max(0))
        np.testing.assert_allclose(
            p[idx == g], e / e.sum(0), rtol=1e-4, atol=1e-5)


def test_segment_softmax_masked():
    idx = np.array([0, 0, 1, 1])
    x = np.array([1.0, 2.0, 3.0, 4.0])
    mask = np.array([True, False, True, True])
    p = np.asarray(seg.segment_softmax(
        jnp.asarray(x), jnp.asarray(idx), 2, mask=jnp.asarray(mask)))
    assert p[1] == 0
    np.testing.assert_allclose(p[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(p[2] + p[3], 1.0, atol=1e-6)


def test_edges_to_dense_exact():
    rng = np.random.default_rng(2)
    n, e = 50, 400
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    nbr, mask, eid = edges_to_dense_neighbors(ei, n)
    # every edge appears exactly once
    assert mask.sum() == e
    src, slot = np.where(mask)
    np.testing.assert_array_equal(np.sort(eid[src, slot]), np.arange(e))
    assert (ei[0][eid[src, slot]] == src).all()
    assert (ei[1][eid[src, slot]] == nbr[src, slot]).all()


def test_untrim_trim():
    ei = np.array([[0, 1, 2], [1, 2, 3]])
    ea = np.arange(3, dtype=np.float32).reshape(3, 1)
    uei, uea = untrim_edges_np(ei, ea)
    assert uei.shape[1] == 6
    tei, tea = to_trimmed_np(uei, uea)
    assert tei.shape[1] == 3
    assert (tei[0] < tei[1]).all()
    np.testing.assert_allclose(np.sort(tea.ravel()), [0, 1, 2])


def test_forward_star():
    src = np.array([2, 0, 1, 0, 2])
    perm, ptr = forward_star_np(src, 3)
    assert (src[perm] == np.array([0, 0, 1, 2, 2])).all()
    np.testing.assert_array_equal(ptr, [0, 2, 3, 5])


def test_eigh_3x3_vs_numpy():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(64, 10, 3)).astype(np.float64)
    C = np.einsum('nki,nkj->nij', X, X) / 10
    w, V = eigh_3x3(jnp.asarray(C))
    w_np, V_np = np.linalg.eigh(C)
    np.testing.assert_allclose(np.asarray(w), w_np, rtol=1e-4, atol=1e-6)
    # eigenvector property: C v = w v (up to sign). Closed-form
    # eigenvectors carry O(eps/gap) error — tolerance reflects that.
    for i in range(3):
        cv = np.einsum('nij,nj->ni', C, np.asarray(V)[:, :, i])
        wv = np.asarray(w)[:, i:i + 1] * np.asarray(V)[:, :, i]
        np.testing.assert_allclose(cv, wv, atol=2e-2)


def test_eigh_3x3_degenerate():
    # isotropic + rank-deficient cases
    C = np.stack([np.eye(3), np.diag([1.0, 1.0, 0.0]), np.zeros((3, 3))])
    w, V = eigh_3x3(jnp.asarray(C))
    w_np, _ = np.linalg.eigh(C)
    np.testing.assert_allclose(np.asarray(w), w_np, atol=1e-3)
    # orthonormality
    VtV = np.einsum('nij,nik->njk', np.asarray(V), np.asarray(V))
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape),
                               atol=2e-2)


def test_geometric_features_plane():
    """Points on a horizontal plane: planarity ~ 1, normal ~ Z."""
    rng = np.random.default_rng(4)
    n, k = 128, 16
    pts = np.zeros((n, 3), dtype=np.float32)
    pts[:, :2] = rng.normal(size=(n, 2))
    # neighbors: random other points (plane is global)
    nbr = rng.integers(0, n, (n, k)).astype(np.int32)
    mask = np.ones((n, k), dtype=bool)
    f = geometric_features(jnp.asarray(pts), jnp.asarray(nbr),
                           jnp.asarray(mask), k_min=5)
    f = {k_: np.asarray(v) for k_, v in f.items()}
    # on a plane the eigenvalue budget splits between linearity and
    # planarity (sampling-dependent), while scattering ~ 0
    assert (f['planarity'] + f['linearity'] > 0.9).all()
    assert (f['scattering'] < 0.1).all()
    np.testing.assert_allclose(np.abs(f['normal'][:, 2]), 1.0, atol=1e-3)
    # normals oriented Z+
    assert (f['normal'][:, 2] > 0).all()


def test_geometric_features_line():
    n, k = 64, 8
    t = np.linspace(0, 1, n).astype(np.float32)
    pts = np.stack([t, t * 2, t * 0.5], 1)
    nbr = np.stack([np.clip(np.arange(n) + d, 0, n - 1)
                    for d in range(-4, 4)], 1).astype(np.int32)
    mask = np.ones_like(nbr, dtype=bool)
    f = geometric_features(jnp.asarray(pts), jnp.asarray(nbr),
                           jnp.asarray(mask), k_min=3)
    lin = np.asarray(f['linearity'])
    assert (lin > 0.9).all()


def test_segment_sum_onehot_path_matches_scatter():
    """The small-num_segments one-hot matmul path (MXU reformulation
    of the TPU-hostile scatter) is numerically identical to
    jax.ops.segment_sum."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from superpoint_transformer_tpu.ops.segment import (
        segment_sum, segment_count, segment_mean)
    rng = np.random.default_rng(0)
    n, g = 5000, 8  # n >= 1024 and g <= 128 -> one-hot path
    x = jnp.asarray(rng.standard_normal((n, 7)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, g, n), jnp.int32)
    ref = jax.ops.segment_sum(x, idx, num_segments=g)
    got = segment_sum(x, idx, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
    # 1-D input
    ref1 = jax.ops.segment_sum(x[:, 0], idx, num_segments=g)
    got1 = segment_sum(x[:, 0], idx, g)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                               rtol=1e-5, atol=1e-4)
    # counts (+ mask) stay exact integers
    mask = jnp.asarray(rng.random(n) < 0.7)
    cnt = segment_count(idx, g, mask=mask)
    ref_cnt = jax.ops.segment_sum(
        mask.astype(jnp.int32), idx, num_segments=g)
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(ref_cnt))
    # out-of-range padding ids contribute nothing (jax drop semantics)
    idx2 = idx.at[:100].set(g + 5)
    np.testing.assert_allclose(
        np.asarray(segment_sum(x, idx2, g)),
        np.asarray(jax.ops.segment_sum(x, idx2, num_segments=g)),
        rtol=1e-5, atol=1e-4)
    # integer VALUES keep the exact scatter path
    xi = jnp.asarray(rng.integers(0, 1 << 26, n), jnp.int64)
    np.testing.assert_array_equal(
        np.asarray(segment_sum(xi, idx, g)),
        np.asarray(jax.ops.segment_sum(xi, idx, num_segments=g)))
    # mean composes
    np.testing.assert_allclose(
        np.asarray(segment_mean(x, idx, g, mask=mask)),
        np.asarray(jax.ops.segment_sum(
            x * mask[:, None], idx, num_segments=g))
        / np.maximum(np.asarray(ref_cnt)[:, None], 1),
        rtol=1e-5, atol=1e-4)


def test_gather_rows_t_grad_matches_plain_gather():
    """gather_rows_t's transpose-table backward equals the autodiff
    of a plain gather (ops/gather.py — the train-step hot fix: the
    plain gather's backward is a serial TPU scatter)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from superpoint_transformer_tpu.ops.gather import gather_rows_t

    rng = np.random.default_rng(0)
    N, K, C = 64, 8, 5
    table = jnp.asarray(rng.standard_normal((N, C)), jnp.float32)
    nbr = rng.integers(0, N, (N, K)).astype(np.int32)
    mask = rng.random((N, K)) < 0.8
    nbr = np.where(mask, nbr, 0)
    # build the transpose table like data/pad.py does
    tgt = nbr[mask]
    slots = np.flatnonzero(mask.reshape(-1)).astype(np.int64)
    order = np.argsort(tgt, kind='stable')
    tgt_s, slots_s = tgt[order], slots[order]
    deg = np.bincount(tgt_s, minlength=N)
    k_in = max(int(deg.max()), 1)
    in_idx = np.zeros((N, k_in), dtype=np.int32)
    in_mask = np.zeros((N, k_in), dtype=bool)
    starts = np.zeros(N + 1, dtype=np.int64)
    np.cumsum(deg, out=starts[1:])
    rank = np.arange(slots_s.shape[0]) - starts[tgt_s]
    in_idx[tgt_s, rank] = slots_s
    in_mask[tgt_s, rank] = True
    nbr_j = jnp.asarray(nbr)
    maskf = jnp.asarray(mask)[:, :, None].astype(jnp.float32)

    def loss_t(t):
        out = gather_rows_t(t, nbr_j, jnp.asarray(in_idx),
                            jnp.asarray(in_mask))
        return ((out * maskf) ** 2).sum()

    def loss_plain(t):
        return ((t[nbr_j] * maskf) ** 2).sum()

    # forward identical
    np.testing.assert_allclose(float(loss_t(table)),
                               float(loss_plain(table)), rtol=1e-6)
    gt = jax.grad(loss_t)(table)
    gp = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gp),
                               rtol=1e-5, atol=1e-5)
