"""Fused Pallas attention kernel vs the XLA reference path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from superpoint_transformer_tpu.ops.pallas_attention import (
    dense_attention_pallas)
from superpoint_transformer_tpu.nn.attention import dense_graph_attention


def _run_kernel(fn, *args):
    if jax.default_backend() == 'cpu':
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            return fn(*args)
    return jax.jit(fn)(*args)


@pytest.mark.parametrize('q_rpe', [False, True])
def test_pallas_attention_matches_xla(q_rpe):
    rng = np.random.default_rng(0)
    N, K, H, D, C = 256, 16, 4, 4, 4
    qshape = (N, K, H, D) if q_rpe else (N, H, D)
    q = jnp.asarray(rng.normal(size=qshape), jnp.float32)
    k = jnp.asarray(rng.normal(size=(N, K, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(N, K, H, C)), jnp.float32)
    mask = jnp.asarray(rng.random((N, K)) > 0.3)
    scale = jnp.asarray(rng.random(N) + 0.5, jnp.float32)

    if q_rpe:
        def ref_fn(q, k, v, mask, scale):
            compat = jnp.einsum(
                'nkhd,nkhd->nkh', q * scale[:, None, None, None], k)
            neg = jnp.asarray(-1e30, compat.dtype)
            compat = jnp.where(mask[:, :, None], compat, neg)
            attn = jax.nn.softmax(compat, axis=1)
            attn = attn * mask[:, :, None].astype(attn.dtype)
            return jnp.einsum('nkh,nkhc->nhc', attn, v)
        ref = jax.jit(ref_fn)(q, k, v, mask, scale)
    else:
        ref = jax.jit(dense_graph_attention)(q, k, v, None, mask, scale)
    out = _run_kernel(
        lambda *a: dense_attention_pallas(*a, block_n=128),
        q, k, v, mask, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_pallas_attention_all_masked_row():
    """Fully padded nodes must produce zeros, not NaNs."""
    N, K, H, D, C = 128, 8, 2, 4, 4
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(N, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(N, K, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(N, K, H, C)), jnp.float32)
    mask = jnp.zeros((N, K), bool).at[: N // 2].set(True)
    scale = jnp.ones(N, jnp.float32)
    out = _run_kernel(
        lambda *a: dense_attention_pallas(*a, block_n=128),
        q, k, v, mask, scale)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert np.abs(out[N // 2:]).max() == 0.0


def test_pallas_attention_gradients_match_xla():
    """custom-VJP backward == XLA autodiff of the same expression."""
    from superpoint_transformer_tpu.ops.pallas_attention import (
        dense_attention_pallas_trainable, _xla_reference)
    rng = np.random.default_rng(2)
    N, K, H, D, C = 128, 8, 2, 4, 4
    q = jnp.asarray(rng.normal(size=(N, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(N, K, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(N, K, H, C)), jnp.float32)
    mask = jnp.asarray(rng.random((N, K)) > 0.3)
    scale = jnp.asarray(rng.random(N) + 0.5, jnp.float32)

    def loss_p(q, k, v, scale):
        return dense_attention_pallas_trainable(
            q, k, v, mask, scale).sum()

    def loss_x(q, k, v, scale):
        return _xla_reference(q, k, v, mask, scale).sum()

    if jax.default_backend() == 'cpu':
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(q, k, v, scale)
    else:
        gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2, 3)))(
            q, k, v, scale)
    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2, 3)))(
        q, k, v, scale)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)


def _rpe_inputs(dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    N, K, H, D, C, De = 256, 16, 4, 4, 32, 8
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), dtype)
    q = mk(N, H, D)
    kg = mk(N, K, H * D)
    vg = mk(N, K, C)
    ef = mk(N, K, De)
    wk = mk(De, H * D) * 0.3
    bk = mk(H * D) * 0.1
    wq = mk(De, H * D) * 0.3
    bq = mk(H * D) * 0.1
    wv = mk(De, C) * 0.3
    bv = mk(C) * 0.1
    mask = jnp.asarray(rng.random((N, K)) < 0.7).at[:, 0].set(True)
    scale = jnp.asarray(rng.random(N) * 0.5 + 0.2, jnp.float32)
    return (q, kg, vg, ef, wk, bk, wq, bq, wv, bv, mask, scale)


def test_fused_rpe_kernel_matches_xla():
    """The streaming fused-RPE kernel (in-kernel k/q/v projections +
    online softmax) equals the XLA reference expression."""
    from superpoint_transformer_tpu.ops.pallas_attention import (
        dense_attention_rpe_pallas, _rpe_xla_reference)
    args = _rpe_inputs()
    ref = np.asarray(_rpe_xla_reference(*args), np.float32)
    got = np.asarray(_run_kernel(
        dense_attention_rpe_pallas, *args), np.float32)
    np.testing.assert_allclose(
        got.reshape(ref.shape), ref, rtol=2e-4, atol=2e-5)


def test_fused_rpe_trainable_grads_flow():
    """The custom-VJP wrapper produces finite grads for every input
    including the RPE weights (XLA-recompute backward)."""
    from superpoint_transformer_tpu.ops.pallas_attention import (
        dense_attention_rpe_trainable, _rpe_xla_reference)
    args = _rpe_inputs()

    def loss_fused(q, kg, vg, ef, wk, bk, wq, bq, wv, bv):
        if jax.default_backend() == 'cpu':
            from jax.experimental.pallas import tpu as pltpu
            with pltpu.force_tpu_interpret_mode():
                out = dense_attention_rpe_trainable(
                    q, kg, vg, ef, wk, bk, wq, bq, wv, bv,
                    args[10], args[11])
        else:
            out = dense_attention_rpe_trainable(
                q, kg, vg, ef, wk, bk, wq, bq, wv, bv, args[10],
                args[11])
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_ref(q, kg, vg, ef, wk, bk, wq, bq, wv, bv):
        out = _rpe_xla_reference(q, kg, vg, ef, wk, bk, wq, bq, wv,
                                 bv, args[10], args[11])
        return (out.astype(jnp.float32) ** 2).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 4, 6, 8))(*args[:10])
    g_ref = jax.grad(loss_ref, argnums=(0, 4, 6, 8))(*args[:10])
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_fused_rpe_pallas_backward_kernel_matches_xla():
    """The single-pass Pallas backward kernel (LSE-rebuilt attention
    weights, in-kernel weight-grad accumulation) equals XLA autodiff
    of the reference expression — for ALL ten gradients."""
    import superpoint_transformer_tpu.ops.pallas_attention as pa
    args = _rpe_inputs()
    mask, scale = args[10], args[11]

    def loss_kernel(*a10):
        out = pa.dense_attention_rpe_trainable(*a10, mask, scale)
        return (out.astype(jnp.float32) * _w).sum()

    def loss_ref(*a10):
        out = pa._rpe_xla_reference(*a10, mask, scale)
        return (out.astype(jnp.float32) * _w).sum()

    rng = np.random.default_rng(7)
    out_shape = np.asarray(pa._rpe_xla_reference(*args)).shape
    _w = jnp.asarray(rng.standard_normal(out_shape), jnp.float32)

    old = pa._FORCE_INTERPRET_BWD
    pa._FORCE_INTERPRET_BWD = True
    try:
        gk = jax.grad(loss_kernel, argnums=tuple(range(10)))(
            *args[:10])
    finally:
        pa._FORCE_INTERPRET_BWD = old
    gr = jax.grad(loss_ref, argnums=tuple(range(10)))(*args[:10])
    names = ['q', 'kg', 'vg', 'ef', 'wk', 'bk', 'wq', 'bq', 'wv',
             'bv']
    for nm, a, b in zip(names, gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
            err_msg=f'grad mismatch for {nm}')
