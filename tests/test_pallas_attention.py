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
