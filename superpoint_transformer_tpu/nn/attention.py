"""SelfAttentionBlock — the hot kernel, TPU-native.

The reference (src/nn/attention.py:167-325) runs edge-list attention:
gather q[s], k[t], v[t] per edge, add RPE encodings of the edge
features, scatter-softmax over edges grouped by source, scatter-sum
back to nodes. Scatters serialize on TPU; here the graph arrives in a
dense padded-neighbor layout `nbr_idx/nbr_mask [N, K]` (built once per
batch, exact — see data/pad.py) and the whole block is dense
gather + einsum + masked softmax: pure MXU/VPU work.

Math parity with the reference:
  - qkv projection: Dense(dim -> 2*H*qk_dim + dim)
  - qk scale 'd.g': 1/sqrt(qk_dim) * 1/sqrt(degree(source)); degree is
    the true in-layout degree (the mask row-sum)
  - k/q/v RPE: Linear on edge features, q may reuse k's encoder
    (qk_share_rpe) or encode -edge_attr (q_on_minus_rpe)
  - compat = <q_e, k_e> per head; softmax over each node's neighbors
"""
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .mlp import xavier_uniform_gain

__all__ = ['SelfAttentionBlock', 'dense_graph_attention',
           'set_pallas_attention']

# global kill-switch for the fused kernel (A/B tests, debugging)
_PALLAS_ENABLED = True
# route RPE projections through the streaming kernel (True) or
# materialize them in XLA and use the plain kernel (False) — A/B knob
_FUSED_RPE_ENABLED = True
# concatenated single-matmul RPE projections in the XLA path — A/B knob
_FUSE_RPE_MATMUL = True


def set_pallas_attention(flag, fused_rpe=None, fuse_rpe_matmul=None):
    global _PALLAS_ENABLED, _FUSED_RPE_ENABLED, _FUSE_RPE_MATMUL
    _PALLAS_ENABLED = bool(flag)
    if fused_rpe is not None:
        _FUSED_RPE_ENABLED = bool(fused_rpe)
    if fuse_rpe_matmul is not None:
        _FUSE_RPE_MATMUL = bool(fuse_rpe_matmul)


def qk_scale_from_degree(mode, qk_dim, degree):
    """Reference build_qk_scale_func (src/utils/nn.py:80-120):
    degree-and-dim-aware softmax temperature; degree [N]."""
    D = float(qk_dim) ** -0.5
    g = jnp.maximum(degree.astype(jnp.float32), 1.0)
    G = g ** -0.5
    if mode is None or mode in ('d.g', 'dg', 'gd', 'd*g', 'g*d', 'g.d'):
        return D * G
    if mode in ('d+g', 'g+d'):
        return D + G
    if mode == 'd':
        return jnp.full_like(G, D)
    if mode == 'g':
        return G
    if isinstance(mode, (int, float)):
        return jnp.full_like(G, float(mode))
    raise ValueError(f'Unknown qk_scale {mode}')


def dense_graph_attention(q, k, v, nbr_idx, nbr_mask, scale):
    """Core attention over dense neighbors.

    :param q: [N, H, D] queries per node
    :param k: [N, K, H, D] keys per (node, neighbor-slot) — already
        gathered and RPE-augmented
    :param v: [N, K, H, C] values per slot
    :param nbr_mask: [N, K] slot validity
    :param scale: [N] per-node softmax scale (applied to q)
    :return: [N, H, C]
    """
    q = q * scale[:, None, None]
    compat = jnp.einsum('nhd,nkhd->nkh', q, k)        # [N, K, H]
    neg = jnp.asarray(-1e30, compat.dtype)
    compat = jnp.where(nbr_mask[:, :, None], compat, neg)
    attn = jax.nn.softmax(compat, axis=1)
    attn = attn * nbr_mask[:, :, None].astype(attn.dtype)
    return jnp.einsum('nkh,nkhc->nhc', attn, v)


class SelfAttentionBlock(nn.Module):
    dim: int
    num_heads: int = 1
    qkv_bias: bool = True
    qk_dim: int = 8
    qk_scale: Optional[str] = None
    in_rpe_dim: int = 18
    k_rpe: bool = False
    q_rpe: bool = False
    v_rpe: bool = False
    qk_share_rpe: bool = False
    q_on_minus_rpe: bool = False
    heads_share_rpe: bool = False
    attn_drop: Optional[float] = None
    drop: Optional[float] = None
    use_pallas: bool = True
    # 'bfloat16' halves the HBM traffic of the [N, K, H, D] q/k/v
    # construction + kernel reads — the dominant cost of this block on
    # TPU (softmax statistics stay fp32 inside the kernel). None/f32
    # keeps exact parity for tests.
    compute_dtype: Optional[str] = None
    # graph-partition parallelism: all_gather the k/v node tables over
    # this mesh axis; nbr_idx then holds GLOBAL slots
    # (device * capacity + local slot) — see parallel/shard_nag.py
    shard_axis: Optional[str] = None
    # A/B knob: run the three RPE projections as one concatenated
    # matmul in the XLA path (same params, same math — equivalence
    # pinned by tests/test_train.py)
    fuse_rpe_matmul: bool = True

    @nn.compact
    def __call__(self, x, nbr_idx, nbr_mask, edge_feat=None, train=True,
                 nbr_in_idx=None, nbr_in_mask=None):
        """
        :param x: [N, C] node features
        :param nbr_idx: [N, K] neighbor (key/value source) node ids
        :param nbr_mask: [N, K] validity
        :param edge_feat: [N, K, De] edge features for RPE
        :param nbr_in_idx/nbr_in_mask: [N, K_in] transpose neighbor
            table (ops/gather.py) — backward of the k/v gathers runs
            as a gather instead of a TPU scatter
        """
        N = x.shape[0]
        K = nbr_idx.shape[1]
        H, D, C = self.num_heads, self.qk_dim, self.dim
        DH = D * H
        dt = jnp.bfloat16 if self.compute_dtype in (
            'bf16', 'bfloat16') else jnp.float32

        qkv = nn.Dense(2 * DH + C, use_bias=self.qkv_bias, dtype=dt,
                       kernel_init=xavier_uniform_gain(), name='qkv')(
            x.astype(dt))
        q = qkv[:, :DH].reshape(N, H, D)
        k_nodes = qkv[:, DH:2 * DH]
        v_nodes = qkv[:, 2 * DH:]

        if self.shard_axis is not None:
            # cross-shard neighbors: assemble the GLOBAL k/v tables
            # (one all_gather per block — rides ICI; superpoint levels
            # are small so this is cheap relative to attention math).
            # The transpose table is local-only — fall back to the
            # plain gather under sharding.
            k_nodes = jax.lax.all_gather(
                k_nodes, self.shard_axis).reshape(-1, DH)
            v_nodes = jax.lax.all_gather(
                v_nodes, self.shard_axis).reshape(-1, C)
            nbr_in_idx = nbr_in_mask = None

        if nbr_in_idx is not None and train:
            from ..ops.gather import gather_rows_t

            def gather(table):
                return gather_rows_t(table, nbr_idx, nbr_in_idx,
                                     nbr_in_mask)
        else:
            def gather(table):
                return table[nbr_idx]

        # TPU row-gathers run at full HBM bandwidth only near 256-byte
        # rows (measured: bf16 [5120,48,64] 128B rows = 418 us, the
        # same data as one 256B-row gather = 72 us; 512B rows slow
        # again). When k and v rows jointly fit 256B (the bf16
        # flagship: 64+64 ch), gather them as ONE slice of the qkv
        # output — also halves the backward's transpose-table gathers.
        itemsize = 2 if dt == jnp.bfloat16 else 4
        fuse_kv_gather = (DH + C) * itemsize <= 256

        def gather_kv(k_tab, v_tab, joint):
            if fuse_kv_gather:
                kvg = gather(joint if joint is not None
                             else jnp.concatenate([k_tab, v_tab], 1))
                return kvg[..., :DH], kvg[..., DH:]
            return gather(k_tab), gather(v_tab)

        attn_dropping = (train and self.attn_drop is not None
                         and self.attn_drop > 0)
        pallas_ok = (_PALLAS_ENABLED and self.use_pallas
                     and not attn_dropping
                     and K % 8 == 0 and N % 128 == 0
                     # bf16 VMEM tiles are (16, 128) on the last dims
                     and (dt == jnp.float32 or K % 16 == 0)
                     and jax.default_backend() != 'cpu')

        # Fully-fused streaming path: k/q/v RPE projections happen
        # INSIDE the kernel (no [N, K, H*D] HBM materialization) —
        # covers the flagship RPE configuration exactly
        # A/B-measured split (see docs/performance.md): at inference
        # the streaming in-kernel RPE wins (no [N,K,HD] HBM
        # materialization: 19.9 vs 21.0 ms on the 8x-demo forward);
        # in training the plain kernel with XLA-materialized RPE wins
        # (26.0 vs 27.2 ms/step on 4-crop batches — the backward's
        # in-kernel per-slot RPE recompute costs more than the
        # materialized tensors' traffic at crop shapes)
        fused_rpe = (pallas_ok and _FUSED_RPE_ENABLED and not train
                     and edge_feat is not None
                     and self.k_rpe and self.q_rpe and self.v_rpe
                     and not self.qk_share_rpe
                     and not self.heads_share_rpe
                     and not self.q_on_minus_rpe)
        if fused_rpe:
            from ..ops.pallas_attention import (
                dense_attention_rpe_pallas,
                dense_attention_rpe_trainable)
            edge_feat = edge_feat.astype(dt)
            # materialize the RPE Dense params (same tree as the XLA
            # path) and hand the weights to the kernel
            dummy = jnp.zeros((1, edge_feat.shape[-1]), dt)
            encs = {}
            for nm, dim_out in (('k_rpe', DH), ('q_rpe', DH),
                                ('v_rpe', C)):
                enc = nn.Dense(dim_out, dtype=dt,
                               kernel_init=xavier_uniform_gain(),
                               name=nm)
                enc(dummy)
                encs[nm] = (enc.variables['params']['kernel'],
                            enc.variables['params']['bias'])
            kg, vg = gather_kv(
                k_nodes, v_nodes,
                qkv[:, DH:] if self.shard_axis is None else None)
            degree = nbr_mask.sum(axis=1)
            scale = qk_scale_from_degree(self.qk_scale, D, degree)
            fn = dense_attention_rpe_trainable if train \
                else dense_attention_rpe_pallas
            out = fn(q, kg, vg, edge_feat,
                     encs['k_rpe'][0], encs['k_rpe'][1],
                     encs['q_rpe'][0], encs['q_rpe'][1],
                     encs['v_rpe'][0], encs['v_rpe'][1],
                     nbr_mask, scale).reshape(N, C)
            out = nn.Dense(C, use_bias=True, dtype=dt,
                           kernel_init=xavier_uniform_gain(),
                           name='out_proj')(out.astype(dt))
            out = out.astype(jnp.float32)
            if self.drop is not None and self.drop > 0:
                out = nn.Dropout(self.drop,
                                 deterministic=not train)(out)
            return out

        # Gather keys/values of the neighbors: [N, K, ...]
        kg, vg = gather_kv(
            k_nodes, v_nodes,
            qkv[:, DH:] if self.shard_axis is None else None)
        k = kg.reshape(N, K, H, D)
        v = vg.reshape(N, K, H, C // H)

        rpe_dim = D if self.heads_share_rpe else DH

        def expand_heads(r):
            if self.heads_share_rpe:
                r = jnp.tile(r, (1, 1, H))
            return r.reshape(N, K, H, D)

        if edge_feat is not None:
            edge_feat = edge_feat.astype(dt)

        # flagship RPE configuration (independent k/q/v encoders): run
        # the three projections as ONE [N*K, De] @ [De, 2*DH+C] matmul
        # (param tree unchanged — the separate k_rpe/q_rpe/v_rpe Dense
        # modules are registered and their kernels concatenated), so
        # forward and backward each dispatch one MXU op instead of
        # three small ones
        rpe_fused_done = (
            self.fuse_rpe_matmul and _FUSE_RPE_MATMUL
            and edge_feat is not None and self.k_rpe and self.q_rpe
            and self.v_rpe and not self.qk_share_rpe
            and not self.q_on_minus_rpe
            and not self.heads_share_rpe)
        if rpe_fused_done:
            dummy = jnp.zeros((1, edge_feat.shape[-1]), dt)
            wb = []
            for nm, dim_out in (('k_rpe', DH), ('q_rpe', DH),
                                ('v_rpe', C)):
                enc = nn.Dense(dim_out, dtype=dt,
                               kernel_init=xavier_uniform_gain(),
                               name=nm)
                enc(dummy)
                wb.append((enc.variables['params']['kernel'],
                           enc.variables['params']['bias']))
            w_cat = jnp.concatenate(
                [w for w, _ in wb], axis=1).astype(dt)
            b_cat = jnp.concatenate(
                [b for _, b in wb]).astype(dt)
            r = edge_feat @ w_cat + b_cat        # [N, K, 2*DH + C]
            k = k + r[..., :DH].reshape(N, K, H, D)
            q = q[:, None] + r[..., DH:2 * DH].reshape(N, K, H, D)
            v = v + r[..., 2 * DH:].reshape(N, K, H, C // H)
        elif self.k_rpe and edge_feat is not None:
            k_enc = nn.Dense(rpe_dim, dtype=dt,
                             kernel_init=xavier_uniform_gain(),
                             name='k_rpe')
            k = k + expand_heads(k_enc(edge_feat))
            if self.q_rpe and self.qk_share_rpe:
                ef = -edge_feat if self.q_on_minus_rpe else edge_feat
                q = q[:, None] + expand_heads(k_enc(ef))
        if self.q_rpe and not (self.k_rpe and self.qk_share_rpe) \
                and edge_feat is not None and not rpe_fused_done:
            ef = -edge_feat if self.q_on_minus_rpe else edge_feat
            q_enc = nn.Dense(rpe_dim, dtype=dt,
                             kernel_init=xavier_uniform_gain(),
                             name='q_rpe')
            q = q[:, None] + expand_heads(q_enc(ef))
        if self.v_rpe and edge_feat is not None and not rpe_fused_done:
            v_rpe_dim = C // H if self.heads_share_rpe else C
            r = nn.Dense(v_rpe_dim, dtype=dt,
                         kernel_init=xavier_uniform_gain(),
                         name='v_rpe')(edge_feat)
            if self.heads_share_rpe:
                r = jnp.tile(r, (1, 1, H))
            v = v + r.reshape(N, K, H, C // H)

        degree = nbr_mask.sum(axis=1)
        scale = qk_scale_from_degree(self.qk_scale, D, degree)

        # Fused Pallas path: one VMEM pass instead of several
        # HBM-materialized [N, K, H] intermediates. Training uses the
        # custom-VJP wrapper (recompute-style backward); attention
        # dropout needs the materialized attn matrix -> XLA path.
        if pallas_ok:
            from ..ops.pallas_attention import (
                dense_attention_pallas,
                dense_attention_pallas_trainable)
            fn = dense_attention_pallas_trainable if train \
                else dense_attention_pallas
            out = fn(q, k, v, nbr_mask, scale).reshape(N, C)
        else:
            if q.ndim == 3:  # no q RPE: broadcast inside einsum
                q = (q * scale[:, None, None]).astype(q.dtype)
                compat = jnp.einsum(
                    'nhd,nkhd->nkh', q, k,
                    preferred_element_type=jnp.float32)
            else:            # q got per-edge RPE: [N, K, H, D]
                q = (q * scale[:, None, None, None]).astype(q.dtype)
                compat = jnp.einsum(
                    'nkhd,nkhd->nkh', q, k,
                    preferred_element_type=jnp.float32)

            neg = jnp.asarray(-1e30, compat.dtype)
            compat = jnp.where(nbr_mask[:, :, None], compat, neg)
            attn = jax.nn.softmax(compat, axis=1)
            attn = attn * nbr_mask[:, :, None].astype(attn.dtype)
            if self.attn_drop is not None and self.attn_drop > 0:
                attn = nn.Dropout(self.attn_drop,
                                  deterministic=not train)(attn)

            out = jnp.einsum(
                'nkh,nkhc->nhc', attn.astype(v.dtype), v,
                preferred_element_type=jnp.float32).reshape(N, C)
        out = nn.Dense(C, use_bias=True, dtype=dt,
                       kernel_init=xavier_uniform_gain(),
                       name='out_proj')(out.astype(dt))
        out = out.astype(jnp.float32)
        if self.drop is not None and self.drop > 0:
            out = nn.Dropout(self.drop, deterministic=not train)(out)
        return out
