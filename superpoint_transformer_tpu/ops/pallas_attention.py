"""Fused dense-neighbor attention kernel (Pallas/TPU).

The SPT hot path (reference scatter attention,
src/nn/attention.py:304-315) arrives here in dense `[N, K]` layout.
After the k/v gathers (XLA handles gathers; Mosaic only lowers
same-shape gathers), the remaining chain

    compat = sum_d q * k  ->  mask  ->  softmax over K  ->  sum_k a * v

is elementwise + K-reductions. XLA materializes [N, K, H] intermediates
in HBM between fusions; this kernel streams node blocks through VMEM
and writes only the final output.

Mosaic lowering constraints shape the design (found empirically on the
v5e backend):
  - batched multi-dim dots / middle-axis reductions / 1D->3D and bool
    broadcasts don't lower -> all math is 2D `[K, block]` elementwise
    with axis-0 reductions; tiny D (qk_dim) and C (dim/heads) axes are
    statically unrolled; the qk scale is folded into q; the mask is
    arithmetic f32;
  - VMEM tiles pad the last two dims to (8, 128) -> operands are laid
    out `[H*D, K, node_block]`: K (~48) is 8-divisible and the node
    block 128-divisible, so tiles pack with ZERO padding (a `[..., K]`
    layout would waste 128/K of VMEM);
  - the layout transposes run in XLA where they fuse with the k/v
    gathers.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['dense_attention_pallas',
           'dense_attention_pallas_trainable']


def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, q_has_k, H, D, C):
    maskf = m_ref[0]                                # [K, B]
    neg_bias = (maskf - 1.0) * 1e30
    for h in range(H):
        compat = jnp.zeros_like(maskf)
        for d in range(D):
            j = h * D + d
            k_d = k_ref[j]                          # [K, B]
            q_d = q_ref[j] if q_has_k else q_ref[j, 0:1]  # [K|1, B]
            compat = compat + q_d * k_d
        compat = compat * maskf + neg_bias
        cmax = jnp.max(compat, axis=0, keepdims=True)
        e = jnp.exp(compat - cmax) * maskf
        denom = jnp.maximum(jnp.sum(e, axis=0, keepdims=True), 1e-30)
        attn = e / denom                            # [K, B]
        for c in range(C):
            v_c = v_ref[h * C + c]                  # [K, B]
            o_ref[h * C + c] = jnp.sum(attn * v_c, axis=0)


def _auto_block_n(K, H, D, C, q_has_k, budget_bytes=8 << 20):
    """Largest power-of-two node block whose double-buffered operand
    tiles fit the VMEM budget (tiles pack exactly — see module doc)."""
    per_node = 4 * (K * H * D * (2 if q_has_k else 1)
                    + K * H * C + H * D + K + H * C)
    b = 1024
    while b > 128 and 2 * b * per_node > budget_bytes:
        b //= 2
    return b


def dense_attention_pallas(q, k, v, nbr_mask, scale, block_n=None):
    """Fused masked-softmax attention over dense neighbor slots.

    :param q: [N, H, D] or [N, K, H, D] (per-edge q RPE)
    :param k: [N, K, H, D]
    :param v: [N, K, H, C]
    :param nbr_mask: [N, K] bool
    :param scale: [N] per-node softmax scale
    :return: [N, H, C] float32
    """
    N, K, H, D = k.shape
    C = v.shape[-1]
    q_has_k = q.ndim == 4
    if block_n is None:
        block_n = _auto_block_n(K, H, D, C, q_has_k)
    block_n = min(block_n, N)
    assert N % block_n == 0 and block_n % 128 == 0, (N, block_n)
    assert K % 8 == 0, f'K={K} must be 8-divisible (pad the slots)'

    if q_has_k:
        # [N, K, H, D] -> [H*D, K, N]
        q_t = (q * scale[:, None, None, None]) \
            .transpose(2, 3, 1, 0).reshape(H * D, K, N)
        q_spec = pl.BlockSpec((H * D, K, block_n),
                              lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM)
    else:
        # [N, H, D] -> [H*D, 1, N]
        q_t = (q * scale[:, None, None]) \
            .transpose(1, 2, 0).reshape(H * D, 1, N)
        q_spec = pl.BlockSpec((H * D, 1, block_n),
                              lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM)
    k_t = k.transpose(2, 3, 1, 0).reshape(H * D, K, N)
    v_t = v.transpose(2, 3, 1, 0).reshape(H * C, K, N)
    maskf = nbr_mask.astype(jnp.float32).T[None]    # [1, K, N]

    out = pl.pallas_call(
        partial(_kernel, q_has_k=q_has_k, H=H, D=D, C=C),
        grid=(N // block_n,),
        in_specs=[
            q_spec,
            pl.BlockSpec((H * D, K, block_n), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H * C, K, block_n), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, block_n), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H * C, block_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H * C, N), jnp.float32),
    )(q_t, k_t, v_t, maskf)
    # [H*C, N] -> [N, H, C]
    return out.reshape(H, C, N).transpose(2, 0, 1)


def _xla_reference(q, k, v, nbr_mask, scale):
    """The mathematically-identical XLA expression (used for the
    custom backward: its autodiff IS the attention gradient)."""
    if q.ndim == 3:
        qq = (q * scale[:, None, None])[:, None]
    else:
        qq = q * scale[:, None, None, None]
    compat = jnp.sum(qq * k, axis=-1)
    neg = jnp.asarray(-1e30, compat.dtype)
    compat = jnp.where(nbr_mask[:, :, None], compat, neg)
    attn = jax.nn.softmax(compat, axis=1)
    attn = attn * nbr_mask[:, :, None].astype(attn.dtype)
    return jnp.einsum('nkh,nkhc->nhc', attn, v)


@jax.custom_vjp
def dense_attention_pallas_trainable(q, k, v, nbr_mask, scale):
    """Differentiable fused attention: the forward runs the Pallas
    kernel; the backward differentiates the equivalent XLA expression
    (recompute-based — the [N, K, H] attention matrix is never stored,
    trading a second fused pass for HBM, a la flash attention)."""
    return dense_attention_pallas(q, k, v, nbr_mask, scale)


def _fwd(q, k, v, nbr_mask, scale):
    out = dense_attention_pallas(q, k, v, nbr_mask, scale)
    return out, (q, k, v, nbr_mask, scale)


def _bwd(res, g):
    q, k, v, nbr_mask, scale = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, s_: _xla_reference(q_, k_, v_, nbr_mask, s_),
        q, k, v, scale)
    dq, dk, dv, ds = vjp(g)
    return dq, dk, dv, None, ds


dense_attention_pallas_trainable.defvjp(_fwd, _bwd)
