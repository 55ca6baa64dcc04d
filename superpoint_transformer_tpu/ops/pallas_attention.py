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
    # operands may arrive bf16 (half the HBM/VMEM traffic); softmax
    # statistics and accumulations run in f32
    f32 = jnp.float32
    maskf = m_ref[0].astype(f32)                    # [K, B]
    neg_bias = (maskf - 1.0) * 1e30
    for h in range(H):
        compat = jnp.zeros_like(maskf)
        for d in range(D):
            j = h * D + d
            k_d = k_ref[j].astype(f32)              # [K, B]
            q_d = (q_ref[j] if q_has_k
                   else q_ref[j, 0:1]).astype(f32)  # [K|1, B]
            compat = compat + q_d * k_d
        compat = compat * maskf + neg_bias
        cmax = jnp.max(compat, axis=0, keepdims=True)
        e = jnp.exp(compat - cmax) * maskf
        denom = jnp.maximum(jnp.sum(e, axis=0, keepdims=True), 1e-30)
        attn = e / denom                            # [K, B]
        for c in range(C):
            v_c = v_ref[h * C + c].astype(f32)      # [K, B]
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
    while block_n > 128 and N % block_n != 0:
        block_n -= 128  # pow2_fine capacities: any 128-multiple
    assert N % block_n == 0 and block_n % 128 == 0, (N, block_n)
    assert K % 8 == 0, f'K={K} must be 8-divisible (pad the slots)'

    dt = k.dtype
    if q_has_k:
        # [N, K, H, D] -> [H*D, K, N]
        q_t = (q * scale[:, None, None, None]).astype(dt) \
            .transpose(2, 3, 1, 0).reshape(H * D, K, N)
        q_spec = pl.BlockSpec((H * D, K, block_n),
                              lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM)
    else:
        # [N, H, D] -> [H*D, 1, N]
        q_t = (q * scale[:, None, None]).astype(dt) \
            .transpose(1, 2, 0).reshape(H * D, 1, N)
        q_spec = pl.BlockSpec((H * D, 1, block_n),
                              lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM)
    k_t = k.transpose(2, 3, 1, 0).reshape(H * D, K, N)
    v_t = v.transpose(2, 3, 1, 0).reshape(H * C, K, N)
    maskf = nbr_mask.astype(dt).T[None]             # [1, K, N]

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


# ---------------------------------------------------------------------------
# Fused-RPE streaming variant. The XLA path materializes three
# [N, K, H*D]-shaped RPE tensors plus their sums with the gathered
# keys/values (~6 full-size HBM round-trips per attention block); here
# the kernel streams neighbor slots with an ONLINE softmax (flash-
# attention style: running max / denominator / value accumulator per
# head) and computes the k/q/v RPE projections per slot on the MXU
# from the compact [De, K, N] edge features. The only big HBM reads
# are the gathered keys/values and the edge features.
# ---------------------------------------------------------------------------


def _rpe_kernel(q_ref, kg_ref, vg_ref, ef_ref, wk_ref, bk_ref,
                wq_ref, bq_ref, wv_ref, bv_ref, m_ref, sc_ref, o_ref,
                *maybe_lse, H, D, C, K):
    f32 = jnp.float32
    B = m_ref.shape[2]
    DH = H * D
    # layouts put K on the LEADING (untiled) axis: Mosaic requires
    # dynamic indices on tiled dims to be 8/16-aligned, but the
    # streaming loop indexes one neighbor slot at a time
    CH = C // H
    wk = wk_ref[...].astype(f32)                    # [De, DH]
    wq = wq_ref[...].astype(f32)
    wv = wv_ref[...].astype(f32)                    # [De, C]
    bk = bk_ref[...].astype(f32)                    # [DH, 1]
    bq = bq_ref[...].astype(f32)
    bv = bv_ref[...].astype(f32)                    # [C, 1]
    q_node = q_ref[:, 0, :].astype(f32)             # [DH, B]
    sc = sc_ref[0, 0, :].astype(f32)                # [B]

    def body(kk, carry):
        m, s, acc = carry                           # [H,B],[H,B],[C,B]
        ef = ef_ref[kk].astype(f32)                 # [De, B]
        k_rpe = jax.lax.dot_general(
            wk, ef, (((0,), (0,)), ((), ())),
            preferred_element_type=f32) + bk        # [DH, B]
        q_rpe = jax.lax.dot_general(
            wq, ef, (((0,), (0,)), ((), ())),
            preferred_element_type=f32) + bq
        v_rpe = jax.lax.dot_general(
            wv, ef, (((0,), (0,)), ((), ())),
            preferred_element_type=f32) + bv        # [C, B]
        k_full = kg_ref[kk].astype(f32) + k_rpe
        q_full = q_node + q_rpe
        v_full = vg_ref[kk].astype(f32) + v_rpe
        prod = q_full * k_full                      # [DH, B]
        # per-head logits: sum D-sized row groups -> [H, B]; the
        # softmax scale applies to (q + q_rpe).k as a whole
        logit = jnp.sum(prod.reshape(H, D, B), axis=1) * sc
        maskk = m_ref[kk, 0, :].astype(f32)         # [B]
        logit = logit * maskk + (maskk - 1.0) * 1e30
        # online softmax update
        m_new = jnp.maximum(m, logit)
        alpha = jnp.exp(m - m_new)                  # [H, B]
        p = jnp.exp(logit - m_new) * maskk          # [H, B]
        s_new = s * alpha + p
        # value accumulate: repeat per-head factors over CH channels
        alpha_c = jnp.repeat(alpha, CH, axis=0)     # [C, B]
        p_c = jnp.repeat(p, CH, axis=0)
        acc_new = acc * alpha_c + p_c * v_full
        return m_new, s_new, acc_new

    m0 = jnp.full((H, B), -1e30, f32)
    s0 = jnp.zeros((H, B), f32)
    a0 = jnp.zeros((C, B), f32)
    # statically unrolled: the RPE dots of different slots are
    # independent of the online-softmax carry, so unrolling lets
    # Mosaic software-pipeline them across iterations
    carry = (m0, s0, a0)
    for kk in range(K):
        carry = body(kk, carry)
    m, s, acc = carry
    denom = jnp.maximum(s, 1e-30)
    o_ref[...] = acc / jnp.repeat(denom, CH, axis=0)
    if maybe_lse:
        # log-sum-exp per (head, node) — the single softmax statistic
        # the backward kernel needs to reconstruct attention weights
        maybe_lse[0][...] = m + jnp.log(denom)


def dense_attention_rpe_pallas(q_node, k_nodes_g, v_nodes_g, ef,
                               wk, bk, wq, bq, wv, bv, nbr_mask,
                               scale, block_n=None, interpret=False,
                               with_lse=False):
    """Streaming fused attention with in-kernel RPE.

    :param q_node: [N, H, D] node queries (no per-edge RPE yet)
    :param k_nodes_g: [N, K, H*D] gathered neighbor keys (no RPE)
    :param v_nodes_g: [N, K, C] gathered neighbor values (no RPE)
    :param ef: [N, K, De] edge features
    :param wk/bk, wq/bq: [De, H*D] / [H*D] RPE projections
    :param wv/bv: [De, C] / [C]
    :param nbr_mask: [N, K] bool
    :param scale: [N] per-node softmax scale (folded into q)
    :return: [N, H, C//H] float32
    """
    N, K, DH = k_nodes_g.shape
    H, D = q_node.shape[1], q_node.shape[2]
    C = v_nodes_g.shape[2]
    De = ef.shape[2]
    assert DH == H * D
    if block_n is None:
        block_n = 512
        per_node = 2 * (DH * (K + 1) + K * C + K * De + K) + 4 * 3 * C
        while block_n > 128 and 2 * block_n * per_node > (10 << 20):
            block_n //= 2
    block_n = min(block_n, N)
    # N is a pow2_fine capacity (any multiple of 128, e.g. 640): the
    # grid needs block_n | N, so drop to the largest 128-multiple
    # divisor (128 always divides the padded capacities)
    while block_n > 128 and N % block_n != 0:
        block_n -= 128
    assert N % block_n == 0 and block_n % 128 == 0, (N, block_n)

    dt = k_nodes_g.dtype
    q_t = q_node.astype(dt).reshape(N, DH).T.reshape(DH, 1, N)
    sc_t = scale.astype(jnp.float32).reshape(1, 1, N)
    kg_t = k_nodes_g.transpose(1, 2, 0)             # [K, DH, N]
    vg_t = v_nodes_g.transpose(1, 2, 0)             # [K, C, N]
    ef_t = ef.transpose(1, 2, 0).astype(dt)         # [K, De, N]
    maskf = nbr_mask.astype(dt).T[:, None, :]       # [K, 1, N]
    w2 = lambda w: w.astype(dt)
    b2 = lambda b: b.reshape(-1, 1).astype(dt)

    out_specs = pl.BlockSpec((C, block_n), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((C, N), jnp.float32)
    if with_lse:
        out_specs = [out_specs,
                     pl.BlockSpec((H, block_n), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((H, N), jnp.float32)]
    out = pl.pallas_call(
        partial(_rpe_kernel, H=H, D=D, C=C, K=K),
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((DH, 1, block_n), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, DH, block_n), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, block_n), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, De, block_n), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((De, DH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DH, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((De, DH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DH, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((De, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, block_n), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(q_t, kg_t, vg_t, ef_t, w2(wk), b2(bk), w2(wq), b2(bq),
      w2(wv), b2(bv), maskf, sc_t)
    if with_lse:
        out, lse = out
        return out.T.reshape(N, H, C // H), lse
    # [C, N] -> [N, H, C//H]
    return out.T.reshape(N, H, C // H)


def _rpe_xla_reference(q_node, k_nodes_g, v_nodes_g, ef, wk, bk, wq,
                       bq, wv, bv, nbr_mask, scale):
    """Mathematically identical XLA expression (tests + the custom
    backward of the trainable wrapper)."""
    N, K, DH = k_nodes_g.shape
    H, D = q_node.shape[1], q_node.shape[2]
    C = v_nodes_g.shape[2]
    k_rpe = ef @ wk + bk                            # [N, K, DH]
    q_rpe = ef @ wq + bq
    v_rpe = ef @ wv + bv                            # [N, K, C]
    k = (k_nodes_g + k_rpe).reshape(N, K, H, D)
    q = (q_node[:, None] * scale[:, None, None, None]
         + q_rpe.reshape(N, K, H, D)
         * scale[:, None, None, None])
    v = (v_nodes_g + v_rpe).reshape(N, K, H, C // H)
    compat = jnp.einsum('nkhd,nkhd->nkh', q, k,
                        preferred_element_type=jnp.float32)
    neg = jnp.asarray(-1e30, compat.dtype)
    compat = jnp.where(nbr_mask[:, :, None], compat, neg)
    attn = jax.nn.softmax(compat, axis=1)
    attn = attn * nbr_mask[:, :, None].astype(attn.dtype)
    return jnp.einsum('nkh,nkhc->nhc', attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Fused-RPE backward kernel. The XLA-autodiff recompute backward
# materializes the [N, K, H*D] RPE tensors AND their cotangents in HBM
# (~10 full-size round-trips). This kernel redoes the flash-attention
# trick for the backward: one streaming pass over neighbor slots that
# (a) recomputes the per-slot RPE projections on the MXU, (b) rebuilds
# the attention weights from the forward's saved log-sum-exp, and
# (c) emits ALL ten input gradients — per-edge activation gradients
# (dkg/dvg/def) stream straight back to HBM in the compute dtype while
# the six RPE weight/bias gradients accumulate in f32 VMEM across the
# sequential TPU grid (written via an init-then-add on program_id).
# ---------------------------------------------------------------------------


def _rpe_bwd_kernel(q_ref, kg_ref, vg_ref, ef_ref, wk_ref, bk_ref,
                    wq_ref, bq_ref, wv_ref, bv_ref, m_ref, sc_ref,
                    g_ref, lse_ref, dl_ref,
                    dq_ref, dkg_ref, dvg_ref, def_ref,
                    dwk_ref, dbk_ref, dwq_ref, dbq_ref, dwv_ref,
                    dbv_ref, *, H, D, C, K):
    f32 = jnp.float32
    B = m_ref.shape[2]
    DH = H * D
    CH = C // H
    dt = kg_ref.dtype
    wk = wk_ref[...].astype(f32)                    # [De, DH]
    wq = wq_ref[...].astype(f32)
    wv = wv_ref[...].astype(f32)                    # [De, C]
    bk = bk_ref[...].astype(f32)                    # [DH, 1]
    bq = bq_ref[...].astype(f32)
    bv = bv_ref[...].astype(f32)                    # [C, 1]
    q_node = q_ref[:, 0, :].astype(f32)             # [DH, B]
    sc = sc_ref[0, 0, :].astype(f32)                # [B]
    g = g_ref[...].astype(f32)                      # [C, B]
    lse = lse_ref[...].astype(f32)                  # [H, B]
    delta = dl_ref[...].astype(f32)                 # [H, B]

    dot = partial(jax.lax.dot_general, preferred_element_type=f32)

    # a lax.fori_loop (NOT a static unroll like the forward): the
    # backward runs ~9 dots per slot and an unrolled schedule keeps
    # enough live f32 temporaries to blow the 16 MB scoped VMEM stack
    def body(kk, carry):
        (dq_acc, wk_acc, wq_acc, wv_acc, bk_acc, bq_acc,
         bv_acc) = carry
        ef = ef_ref[kk].astype(f32)                 # [De, B]
        # recompute the forward's per-slot quantities
        k_rpe = dot(wk, ef, (((0,), (0,)), ((), ()))) + bk
        q_rpe = dot(wq, ef, (((0,), (0,)), ((), ()))) + bq
        v_rpe = dot(wv, ef, (((0,), (0,)), ((), ()))) + bv
        k_full = kg_ref[kk].astype(f32) + k_rpe     # [DH, B]
        q_full = q_node + q_rpe
        v_full = vg_ref[kk].astype(f32) + v_rpe     # [C, B]
        maskk = m_ref[kk, 0, :].astype(f32)         # [B]
        raw = jnp.sum((q_full * k_full).reshape(H, D, B), axis=1)
        logit = (raw * sc) * maskk + (maskk - 1.0) * 1e30
        p = jnp.exp(logit - lse) * maskk            # [H, B] attn wts
        # value-path gradient
        dv_full = jnp.repeat(p, CH, axis=0) * g     # [C, B]
        # logit gradient: p * (g.v - delta), scale folded back in
        dp = jnp.sum((g * v_full).reshape(H, CH, B), axis=1)
        e = p * (dp - delta) * sc                   # [H, B]
        e_d = jnp.repeat(e, D, axis=0)              # [DH, B]
        dq_full = e_d * k_full
        dk_full = e_d * q_full
        dkg_ref[kk] = dk_full.astype(dt)
        dvg_ref[kk] = dv_full.astype(dt)
        # edge-feature gradient: back through all three projections
        d_ef = (dot(wk, dk_full, (((1,), (0,)), ((), ())))
                + dot(wq, dq_full, (((1,), (0,)), ((), ())))
                + dot(wv, dv_full, (((1,), (0,)), ((), ()))))
        def_ref[kk] = d_ef.astype(dt)
        # weight/bias gradients (f32, contracted over the node block)
        return (
            dq_acc + dq_full,
            wk_acc + dot(ef, dk_full, (((1,), (1,)), ((), ()))),
            wq_acc + dot(ef, dq_full, (((1,), (1,)), ((), ()))),
            wv_acc + dot(ef, dv_full, (((1,), (1,)), ((), ()))),
            bk_acc + jnp.sum(dk_full, axis=1, keepdims=True),
            bq_acc + jnp.sum(dq_full, axis=1, keepdims=True),
            bv_acc + jnp.sum(dv_full, axis=1, keepdims=True))

    init = (jnp.zeros((DH, B), f32),
            jnp.zeros(wk.shape, f32), jnp.zeros(wq.shape, f32),
            jnp.zeros(wv.shape, f32), jnp.zeros((DH, 1), f32),
            jnp.zeros((DH, 1), f32), jnp.zeros((C, 1), f32))
    (dq_acc, wk_acc, wq_acc, wv_acc, bk_acc, bq_acc,
     bv_acc) = jax.lax.fori_loop(0, K, body, init)

    dq_ref[...] = dq_acc.astype(dt)

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        dwk_ref[...] = wk_acc
        dwq_ref[...] = wq_acc
        dwv_ref[...] = wv_acc
        dbk_ref[...] = bk_acc
        dbq_ref[...] = bq_acc
        dbv_ref[...] = bv_acc

    @pl.when(jnp.logical_not(first))
    def _accum():
        dwk_ref[...] += wk_acc
        dwq_ref[...] += wq_acc
        dwv_ref[...] += wv_acc
        dbk_ref[...] += bk_acc
        dbq_ref[...] += bq_acc
        dbv_ref[...] += bv_acc


def dense_attention_rpe_bwd_pallas(q_node, k_nodes_g, v_nodes_g, ef,
                                   wk, bk, wq, bq, wv, bv, nbr_mask,
                                   scale, out, lse, g, block_n=None,
                                   interpret=False):
    """Gradients of the fused-RPE attention in one streaming pass.

    `out`/`lse` are the forward kernel's outputs (with_lse=True);
    `g` is the cotangent of `out` ([N, H, C//H]). Returns gradients
    for the first ten forward arguments (q_node .. bv)."""
    N, K, DH = k_nodes_g.shape
    H, D = q_node.shape[1], q_node.shape[2]
    C = v_nodes_g.shape[2]
    De = ef.shape[2]
    assert DH == H * D
    if block_n is None:
        block_n = 512
        # single-copy VMEM bytes per node column (compute-dtype
        # ins/outs, f32 g/lse/delta); keep the double-buffered set
        # under ~11 MB
        es = jnp.dtype(k_nodes_g.dtype).itemsize
        per_node = es * (2 * K * (DH + C + De) + 2 * DH + K)  \
            + 4 * (C + 3 * H)
        while block_n > 128 and 2 * block_n * per_node > (11 << 20):
            block_n //= 2
    block_n = min(block_n, N)
    while block_n > 128 and N % block_n != 0:
        block_n -= 128  # pow2_fine capacities: any 128-multiple
    assert N % block_n == 0 and block_n % 128 == 0, (N, block_n)

    dt = k_nodes_g.dtype
    q_t = q_node.astype(dt).reshape(N, DH).T.reshape(DH, 1, N)
    sc_t = scale.astype(jnp.float32).reshape(1, 1, N)
    kg_t = k_nodes_g.transpose(1, 2, 0)             # [K, DH, N]
    vg_t = v_nodes_g.transpose(1, 2, 0)             # [K, C, N]
    ef_t = ef.transpose(1, 2, 0).astype(dt)         # [K, De, N]
    maskf = nbr_mask.astype(dt).T[:, None, :]       # [K, 1, N]
    g = g.astype(jnp.float32)
    g_t = g.reshape(N, C).T                         # [C, N]
    # delta[h, n] = sum_c g * out  (the softmax-grad row correction)
    dl_t = jnp.sum(g * out.astype(jnp.float32), axis=2).T  # [H, N]
    w2 = lambda w: w.astype(dt)
    b2 = lambda b: b.reshape(-1, 1).astype(dt)

    full = lambda shp: pl.BlockSpec(shp, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    col2 = lambda r: pl.BlockSpec((r, block_n), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    col3 = lambda a, b: pl.BlockSpec((a, b, block_n),
                                     lambda i: (0, 0, i),
                                     memory_space=pltpu.VMEM)
    f32s = jax.ShapeDtypeStruct
    grads = pl.pallas_call(
        partial(_rpe_bwd_kernel, H=H, D=D, C=C, K=K),
        grid=(N // block_n,),
        in_specs=[
            col3(DH, 1), col3(K, DH), col3(K, C), col3(K, De),
            full((De, DH)), full((DH, 1)), full((De, DH)),
            full((DH, 1)), full((De, C)), full((C, 1)),
            col3(K, 1), col3(1, 1), col2(C), col2(H), col2(H),
        ],
        out_specs=[
            col2(DH), col3(K, DH), col3(K, C), col3(K, De),
            full((De, DH)), full((DH, 1)), full((De, DH)),
            full((DH, 1)), full((De, C)), full((C, 1)),
        ],
        out_shape=[
            f32s((DH, N), dt), f32s((K, DH, N), dt),
            f32s((K, C, N), dt), f32s((K, De, N), dt),
            f32s((De, DH), jnp.float32), f32s((DH, 1), jnp.float32),
            f32s((De, DH), jnp.float32), f32s((DH, 1), jnp.float32),
            f32s((De, C), jnp.float32), f32s((C, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q_t, kg_t, vg_t, ef_t, w2(wk), b2(bk), w2(wq), b2(bq),
      w2(wv), b2(bv), maskf, sc_t, g_t, lse.astype(jnp.float32),
      dl_t)
    dq_t, dkg_t, dvg_t, def_t, dwk, dbk, dwq, dbq, dwv, dbv = grads
    dq = dq_t.T.reshape(N, H, D).astype(q_node.dtype)
    dkg = dkg_t.transpose(2, 0, 1).astype(k_nodes_g.dtype)
    dvg = dvg_t.transpose(2, 0, 1).astype(v_nodes_g.dtype)
    d_ef = def_t.transpose(2, 0, 1).astype(ef.dtype)
    return (dq, dkg, dvg, d_ef,
            dwk.astype(wk.dtype), dbk[:, 0].astype(bk.dtype),
            dwq.astype(wq.dtype), dbq[:, 0].astype(bq.dtype),
            dwv.astype(wv.dtype), dbv[:, 0].astype(bv.dtype))


# Tests flip this to exercise the Pallas backward in interpret mode on
# CPU; on a real TPU backend the kernel backward is used by default.
_FORCE_INTERPRET_BWD = False


@jax.custom_vjp
def dense_attention_rpe_trainable(q_node, k_nodes_g, v_nodes_g, ef,
                                  wk, bk, wq, bq, wv, bv, nbr_mask,
                                  scale):
    """Differentiable fused-RPE attention: Pallas forward, Pallas
    single-pass backward (flash-attention style: the [N, K, H]
    attention matrix is never stored; the backward rebuilds it from
    the saved per-(head, node) log-sum-exp)."""
    return dense_attention_rpe_pallas(
        q_node, k_nodes_g, v_nodes_g, ef, wk, bk, wq, bq, wv, bv,
        nbr_mask, scale)


def _rpe_fwd(q_node, k_nodes_g, v_nodes_g, ef, wk, bk, wq, bq, wv,
             bv, nbr_mask, scale):
    interp = _FORCE_INTERPRET_BWD
    use_kernel_bwd = interp or jax.default_backend() != 'cpu'
    if use_kernel_bwd:
        out, lse = dense_attention_rpe_pallas(
            q_node, k_nodes_g, v_nodes_g, ef, wk, bk, wq, bq, wv, bv,
            nbr_mask, scale, with_lse=True, interpret=interp)
    else:
        out = dense_attention_rpe_pallas(
            q_node, k_nodes_g, v_nodes_g, ef, wk, bk, wq, bq, wv, bv,
            nbr_mask, scale)
        lse = None
    return out, (q_node, k_nodes_g, v_nodes_g, ef, wk, bk, wq, bq,
                 wv, bv, nbr_mask, scale, out if use_kernel_bwd
                 else None, lse)


def _rpe_bwd(res, g):
    (q_node, k_nodes_g, v_nodes_g, ef, wk, bk, wq, bq, wv, bv,
     nbr_mask, scale, out, lse) = res
    if lse is not None:
        grads = dense_attention_rpe_bwd_pallas(
            q_node, k_nodes_g, v_nodes_g, ef, wk, bk, wq, bq, wv, bv,
            nbr_mask, scale, out, lse, g,
            interpret=_FORCE_INTERPRET_BWD)
        return grads + (None, None)
    _, vjp = jax.vjp(
        lambda *a: _rpe_xla_reference(*a, nbr_mask, scale),
        q_node, k_nodes_g, v_nodes_g, ef, wk, bk, wq, bq, wv, bv)
    grads = vjp(g)
    return grads + (None, None)


dense_attention_rpe_trainable.defvjp(_rpe_fwd, _rpe_bwd)
