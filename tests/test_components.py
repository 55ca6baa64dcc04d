"""Graph-component ops (EZ-SP building blocks) + loss-family tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from superpoint_transformer_tpu.ops.components import (
    wcc_by_max_propagation_np, component_graph_np,
    merge_components_by_contour_prior_np, connect_isolated_knn_np)


def test_wcc_two_components():
    # 0-1-2 chain and 3-4 pair, 5 isolated
    ei = np.array([[0, 1, 3], [1, 2, 4]])
    labels, n = wcc_by_max_propagation_np(6, ei)
    assert n == 3
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[5] not in (labels[0], labels[3])


def test_wcc_long_chain():
    n = 257
    ei = np.stack([np.arange(n - 1), np.arange(1, n)])
    labels, c = wcc_by_max_propagation_np(n, ei)
    assert c == 1 and np.all(labels == labels[0])


def test_component_graph_coalesce():
    I = np.array([0, 0, 1, 1, 2])
    ei = np.array([[0, 1, 2, 0, 4], [2, 3, 3, 1, 4]])
    w = np.array([1., 2., 3., 9., 5.])
    ei_cp, w_cp = component_graph_np(I, ei, w, reduce='add')
    # edges: (0,1) from 0-2 and 1-3 => 1+2=3 ; (1,1) self from 2-3
    # dropped ; (0,0) self dropped ; (2,2) self dropped
    assert ei_cp.shape == (2, 1)
    assert tuple(ei_cp[:, 0]) == (0, 1)
    assert w_cp[0] == pytest.approx(3.0)


def test_merge_components_contour_prior():
    # two tight feature clusters weakly connected: high reg merges all,
    # low reg keeps the clusters apart
    x = np.array([[0.], [0.1], [5.], [5.1]], np.float32)
    size = np.ones(4, np.float32)
    ei = np.array([[0, 1, 2], [1, 2, 3]])
    w = np.ones(3, np.float32)
    lab_lo, n_lo, _ = merge_components_by_contour_prior_np(
        x, size, ei, w, reg=0.01, min_size=1)
    assert n_lo == 2
    assert lab_lo[0] == lab_lo[1] and lab_lo[2] == lab_lo[3]
    assert lab_lo[0] != lab_lo[2]
    lab_hi, n_hi, _ = merge_components_by_contour_prior_np(
        x, size, ei, w, reg=100.0, min_size=1)
    assert n_hi == 1


def test_merge_min_size_forces_merge():
    x = np.array([[0.], [10.], [10.1]], np.float32)
    size = np.array([1., 5., 5.], np.float32)
    ei = np.array([[0, 1], [1, 2]])
    w = np.ones(2, np.float32)
    lab, n, (x_m, s_m, ei_m, w_m, _) = \
        merge_components_by_contour_prior_np(
            x, size, ei, w, reg=1e-6, min_size=3, merge_only_small=True)
    # node 0 (size 1 < 3) must merge into a neighbor
    assert n == 2 or n == 1
    assert s_m.min() >= 3 or n == 1


def test_connect_isolated():
    pos = np.array([[0, 0, 0], [1, 0, 0], [5, 0, 0]], np.float32)
    ei = np.array([[0], [1]])
    w = np.ones(1, np.float32)
    ei2, w2 = connect_isolated_knn_np(ei, w, pos, k=1)
    assert ei2.shape[1] > 1
    # node 2 now has an edge
    assert (ei2 == 2).any()


# ---- losses -----------------------------------------------------------
def test_binary_focal_loss_basic():
    from superpoint_transformer_tpu.loss import binary_focal_loss
    p = jnp.array([0.9, 0.1, 0.5])
    y = jnp.array([True, False, True])
    l_good = binary_focal_loss(jnp.array([0.99, 0.01, 0.99]),
                               y, gamma=1.0)
    l_bad = binary_focal_loss(jnp.array([0.01, 0.99, 0.01]),
                              y, gamma=1.0)
    assert float(l_good) < float(l_bad)


def test_weighted_focal_matches_ce_at_gamma0():
    from superpoint_transformer_tpu.loss import weighted_focal_loss
    import jax
    logits = jnp.array([[2., 0., 0.], [0., 1., 0.]])
    y = jnp.array([0, 1])
    l = weighted_focal_loss(logits, y, gamma=0.0)
    ref = -jax.nn.log_softmax(logits)[jnp.arange(2), y].mean()
    assert float(l) == pytest.approx(float(ref), rel=1e-5)


def test_lovasz_perfect_prediction_lower():
    from superpoint_transformer_tpu.loss import lovasz_softmax_loss
    y = jnp.array([0, 0, 1, 1, 2])
    good = jnp.eye(3)[y] * 10.0
    bad = jnp.roll(good, 1, axis=1)
    assert float(lovasz_softmax_loss(good, y)) < \
        float(lovasz_softmax_loss(bad, y))


def test_partition_criterion_contrast():
    from superpoint_transformer_tpu.loss import partition_criterion
    # 4 nodes, classes [0,0,1,1]; embeddings either aligned with the
    # classes (low loss) or anti-aligned (high loss)
    y_hist = jnp.asarray(np.eye(3)[[0, 0, 1, 1]] * 5)  # C=2 + void col
    ei = jnp.array([[0, 1, 2, 0], [1, 2, 3, 2]])
    x_good = jnp.array([[0.], [0.], [5.], [5.]])
    x_bad = jnp.array([[0.], [5.], [0.], [5.]])
    l_good, aux = partition_criterion(
        x_good, y_hist, ei, num_classes=2, train=False)
    l_bad, _ = partition_criterion(
        x_bad, y_hist, ei, num_classes=2, train=False)
    assert int(aux['n_inter_edge']) == 2  # edges 1-2 and 0-2 cross
    assert float(l_good) < float(l_bad)


def test_partition_criterion_no_edges_zero_loss():
    from superpoint_transformer_tpu.loss import partition_criterion
    y_hist = jnp.asarray(np.eye(3)[[0, 0]] * 5)
    ei = jnp.zeros((2, 4), jnp.int32)
    mask = jnp.zeros(4, bool)
    loss, aux = partition_criterion(
        jnp.zeros((2, 4)), y_hist, ei, edge_mask=mask, num_classes=2)
    assert float(loss) == 0.0


def test_weighted_bce_and_l2():
    from superpoint_transformer_tpu.loss import (
        weighted_bce_with_logits_loss, weighted_l2_loss)
    logits = jnp.array([10., -10.])
    tgt = jnp.array([1., 0.])
    assert float(weighted_bce_with_logits_loss(logits, tgt)) < 1e-3
    l2 = weighted_l2_loss(jnp.array([[1., 1.]]), jnp.array([[0., 0.]]))
    assert float(l2) == pytest.approx(2.0)
