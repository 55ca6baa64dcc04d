"""SPT — Superpoint Transformer backbone (reference
src/models/components/spt.py:14, forward :760): a U-Net over the NAG
hierarchy. PointStage encodes level-0 points; DownNFuseStages pool and
self-attend over superpoint levels 1..L; UpNFuseStages decode back down
with skip connections; handcrafted node / horizontal-edge / vertical-
edge features are MLP-encoded per level before use.

Consumes a `PaddedNAG` (static shapes, dense neighbors); all feature
concatenation (`nag.add_keys_to`) happens host-side at batch prep.
"""
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..data.pad import PaddedNAG
from ..nn.mlp import MLP
from ..nn.stage import Stage, DownNFuseStage, UpNFuseStage, PointStage, _cat

__all__ = ['SPT']


class SPT(nn.Module):
    # point stage
    point_mlp: Optional[Sequence[int]] = None
    point_drop: Optional[float] = None
    # EZ-SP: sparse voxel CNN ahead of the point MLP (channels exclude
    # the input dim; consumed when the batch carries cnn_nbr_idx)
    point_cnn: Optional[Sequence[int]] = None
    point_cnn_into_mlp: bool = True
    nano: bool = False

    # encoder
    down_dim: Sequence[int] = (64, 64)
    down_in_mlp: Sequence[Sequence[int]] = ()
    down_out_mlp: Optional[Sequence[Sequence[int]]] = None
    down_mlp_drop: Optional[float] = None
    down_num_heads: int = 16
    down_num_blocks: int = 3
    down_ffn_ratio: float = 1
    down_residual_drop: Optional[float] = None
    down_attn_drop: Optional[float] = None
    down_drop_path: Optional[float] = None

    # decoder
    up_dim: Sequence[int] = (64,)
    up_in_mlp: Sequence[Sequence[int]] = ()
    up_out_mlp: Optional[Sequence[Sequence[int]]] = None
    up_mlp_drop: Optional[float] = None
    up_num_heads: int = 16
    up_num_blocks: int = 1
    up_ffn_ratio: float = 1
    up_residual_drop: Optional[float] = None
    up_attn_drop: Optional[float] = None
    up_drop_path: Optional[float] = None

    # handcrafted-feature MLPs
    node_mlp: Optional[Sequence[int]] = None
    h_edge_mlp: Optional[Sequence[int]] = (18, 32, 32)
    v_edge_mlp: Optional[Sequence[int]] = None
    share_hf_mlps: bool = False

    # attention / norm config
    qk_dim: int = 4
    qkv_bias: bool = True
    qk_scale: Optional[str] = None
    in_rpe_dim: int = 32
    norm: str = 'graph'
    mlp_norm: str = 'graph'
    pre_norm: bool = True
    no_sa: bool = False
    no_ffn: bool = True
    k_rpe: bool = True
    q_rpe: bool = True
    v_rpe: bool = True
    qk_share_rpe: bool = False
    q_on_minus_rpe: bool = False
    stages_share_rpe: bool = False
    blocks_share_rpe: bool = False
    heads_share_rpe: bool = False

    use_pos: bool = True
    use_node_hf: bool = True
    use_diameter: bool = False
    use_diameter_parent: bool = True
    pool: str = 'max'
    unpool: str = 'index'
    fusion: str = 'cat'
    norm_mode: str = 'graph'
    output_stage_wise: bool = True
    num_graphs: int = 8
    # graph-partition parallelism (parallel/shard_nag.py): mesh axis
    # over which node shards cooperate
    # 'bfloat16' runs the attention blocks' qkv/RPE/kernel path in
    # bf16 (fp32 softmax statistics + fp32 params): ~2x less HBM
    # traffic on the forward's dominant cost. None = full fp32.
    compute_dtype: Optional[str] = None
    shard_axis: Optional[str] = None

    @property
    def num_down_stages(self):
        return len(self.down_dim) - int(self.nano)

    @property
    def num_up_stages(self):
        return len(self.up_dim)

    @property
    def out_dim(self):
        def stage_out(dims_out, dim, i):
            if dims_out:
                return dims_out[i][-1]
            return dim

        if self.output_stage_wise:
            ups = [
                stage_out(self.up_out_mlp, self.up_dim[i], i)
                for i in range(len(self.up_dim))][::-1]
            last_down = stage_out(
                self.down_out_mlp, self.down_dim[-1],
                len(self.down_dim) - 1)
            return ups + [last_down]
        if self.up_dim:
            return stage_out(self.up_out_mlp, self.up_dim[-1],
                             len(self.up_dim) - 1)
        return stage_out(self.down_out_mlp, self.down_dim[-1],
                         len(self.down_dim) - 1)

    def _norm_index(self, level):
        """Grouping index for the index-based norms (reference
        Data.norm_index, src/data/data.py:103 — norm_mode selects
        'graph'/'node'/'segment' grouping; every reference config uses
        'graph', configs/model/semantic/spt.yaml:34, which is what the
        padded layout supports: the per-node graph id)."""
        if self.norm_mode != 'graph':
            raise NotImplementedError(
                f"norm_mode={self.norm_mode!r}: only 'graph' (the "
                "reference default) is supported in the padded layout")
        return level.batch

    @nn.compact
    def __call__(self, nag: PaddedNAG, train: bool = True):
        assert int(self.nano) == nag.start_i_level, \
            "nano mode must match the NAG's start level"
        start = nag.start_i_level
        num_down = self.num_down_stages

        # ---- per-level handcrafted-feature MLPs -----------------------
        # (reference spt.py:826-841: node/h-edge/v-edge MLPs applied to
        # each level before the corresponding down stage)
        xs = {}          # level -> node handcrafted features (post MLP)
        efs = {}         # level -> edge features (post MLP), [N, K, D]
        vefs = {}        # level -> v_edge features (post MLP)
        for i_stage in range(num_down + int(self.nano)):
            i_level = i_stage + 1
            lvl = nag[i_level]
            ni = self._norm_index(lvl)
            x_hf = lvl.x if self.use_node_hf else None
            if x_hf is not None and self.node_mlp is not None:
                name = 'node_mlp_shared' if self.share_hf_mlps \
                    else f'node_mlp_{i_stage}'
                x_hf = MLP(tuple(self.node_mlp), norm=self.mlp_norm,
                           num_graphs=self.num_graphs,
                           compute_dtype=self.compute_dtype,
                shard_axis=self.shard_axis, name=name)(
                    x_hf, batch=ni, mask=lvl.node_mask, train=train)
            xs[i_level] = x_hf

            ef = lvl.edge_feat
            if ef is not None and self.h_edge_mlp is not None:
                name = 'h_edge_mlp_shared' if self.share_hf_mlps \
                    else f'h_edge_mlp_{i_stage}'
                N, K, De = ef.shape
                flat = ef.reshape(N * K, De)
                eb = jnp.repeat(ni, K)
                em = lvl.nbr_mask.reshape(N * K)
                flat = MLP(tuple(self.h_edge_mlp), norm=self.mlp_norm,
                           num_graphs=self.num_graphs,
                           compute_dtype=self.compute_dtype,
                shard_axis=self.shard_axis, name=name)(
                    flat, batch=eb, mask=em, train=train)
                ef = flat.reshape(N, K, -1) * em.reshape(N, K, 1)
            efs[i_level] = ef

            child = nag[i_level - 1] if i_level - 1 >= start else None
            vef = child.v_edge_attr if child is not None else None
            if vef is not None and self.v_edge_mlp is not None:
                name = 'v_edge_mlp_shared' if self.share_hf_mlps \
                    else f'v_edge_mlp_{i_stage}'
                vef = MLP(tuple(self.v_edge_mlp), norm=self.mlp_norm,
                          num_graphs=self.num_graphs,
                          compute_dtype=self.compute_dtype,
                shard_axis=self.shard_axis, name=name)(
                    vef, batch=self._norm_index(child),
                    mask=child.node_mask, train=train)
            vefs[i_level] = vef

        shared = dict(
            qk_dim=self.qk_dim, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, in_rpe_dim=self.in_rpe_dim,
            norm=self.norm, mlp_norm=self.mlp_norm,
            pre_norm=self.pre_norm, no_sa=self.no_sa, no_ffn=self.no_ffn,
            k_rpe=self.k_rpe, q_rpe=self.q_rpe, v_rpe=self.v_rpe,
            qk_share_rpe=self.qk_share_rpe,
            q_on_minus_rpe=self.q_on_minus_rpe,
            blocks_share_rpe=self.blocks_share_rpe,
            heads_share_rpe=self.heads_share_rpe,
            use_pos=self.use_pos, use_diameter=self.use_diameter,
            use_diameter_parent=self.use_diameter_parent,
            num_graphs=self.num_graphs,
            compute_dtype=self.compute_dtype,
            shard_axis=self.shard_axis)

        # ---- first stage ----------------------------------------------
        lvl0 = nag[start]
        parent_cap = nag[start + 1].capacity
        if self.nano:
            first = Stage(
                dim=self.down_dim[0], num_blocks=self.down_num_blocks,
                num_heads=self.down_num_heads,
                in_mlp=tuple(self.down_in_mlp[0]),
                out_mlp=(tuple(self.down_out_mlp[0])
                         if self.down_out_mlp else None),
                mlp_drop=self.down_mlp_drop,
                ffn_ratio=self.down_ffn_ratio,
                residual_drop=self.down_residual_drop,
                attn_drop=self.down_attn_drop,
                drop_path=self.down_drop_path,
                name='first_stage', **shared)
            x, diameter = first(
                xs[1], self._norm_index(lvl0), pos=lvl0.pos,
                node_size=lvl0.node_size, super_index=lvl0.super_index,
                num_super=parent_cap, nbr_idx=lvl0.nbr_idx,
                nbr_mask=lvl0.nbr_mask,
                nbr_in_idx=lvl0.nbr_in_idx,
                nbr_in_mask=lvl0.nbr_in_mask, edge_feat=efs.get(1),
                mask=lvl0.node_mask, train=train)
        else:
            first = PointStage(
                dim=self.point_mlp[-1], num_blocks=0,
                in_mlp=tuple(self.point_mlp),
                mlp_drop=self.point_drop,
                cnn_channels=(tuple(self.point_cnn)
                              if self.point_cnn else None),
                cnn_into_mlp=self.point_cnn_into_mlp,
                name='first_stage', **shared)
            x, diameter = first(
                lvl0.x if self.use_node_hf else None,
                self._norm_index(lvl0), pos=lvl0.pos,
                node_size=lvl0.node_size, super_index=lvl0.super_index,
                num_super=parent_cap, mask=lvl0.node_mask,
                cnn_nbr_idx=lvl0.cnn_nbr_idx, train=train)

        diameters = {start + 1: diameter}

        # ---- encoder ----------------------------------------------------
        down_outputs = []
        if self.nano:
            down_outputs.append(x)
        for i_stage in range(num_down):
            i_level = i_stage + 1 + int(self.nano)
            lvl = nag[i_level]
            child = nag[i_level - 1]
            is_last = i_level == nag.end_i_level
            j = i_stage + int(self.nano)
            stage = DownNFuseStage(
                dim=self.down_dim[j],
                num_blocks=self.down_num_blocks,
                num_heads=self.down_num_heads,
                in_mlp=tuple(self.down_in_mlp[j]),
                out_mlp=(tuple(self.down_out_mlp[j])
                         if self.down_out_mlp else None),
                mlp_drop=self.down_mlp_drop,
                ffn_ratio=self.down_ffn_ratio,
                residual_drop=self.down_residual_drop,
                attn_drop=self.down_attn_drop,
                drop_path=self.down_drop_path,
                pool=self.pool, fusion=self.fusion,
                name=f'down_stage_{i_stage}', **shared)
            x, diameter = stage(
                xs[i_level], x, self._norm_index(lvl),
                child.super_index, num_parents=lvl.capacity,
                pos=lvl.pos, diameter=diameters.get(i_level),
                node_size=lvl.node_size,
                super_index=None if is_last else lvl.super_index,
                num_super=None if is_last
                else nag[i_level + 1].capacity,
                nbr_idx=lvl.nbr_idx, nbr_mask=lvl.nbr_mask,
                nbr_in_idx=lvl.nbr_in_idx,
                nbr_in_mask=lvl.nbr_in_mask,
                edge_feat=efs.get(i_level),
                v_edge_attr=vefs.get(i_level),
                child_mask=child.node_mask, mask=lvl.node_mask,
                train=train)
            down_outputs.append(x)
            if not is_last:
                diameters[i_level + 1] = diameter

        # ---- decoder ----------------------------------------------------
        up_outputs = []
        for i_stage in range(self.num_up_stages):
            i_level = num_down - i_stage - 1 + int(self.nano)
            lvl = nag[i_level]
            x_skip = down_outputs[-(2 + i_stage)]
            stage = UpNFuseStage(
                dim=self.up_dim[i_stage],
                num_blocks=self.up_num_blocks,
                num_heads=self.up_num_heads,
                in_mlp=tuple(self.up_in_mlp[i_stage]),
                out_mlp=(tuple(self.up_out_mlp[i_stage])
                         if self.up_out_mlp else None),
                mlp_drop=self.up_mlp_drop,
                ffn_ratio=self.up_ffn_ratio,
                residual_drop=self.up_residual_drop,
                attn_drop=self.up_attn_drop,
                drop_path=self.up_drop_path,
                fusion=self.fusion,
                name=f'up_stage_{i_stage}', **shared)
            x, _ = stage(
                _cat(x_skip, xs[i_level]), x, self._norm_index(lvl),
                lvl.super_index, pos=lvl.pos,
                node_size=lvl.node_size, super_index=lvl.super_index,
                num_super=nag[i_level + 1].capacity,
                nbr_idx=lvl.nbr_idx, nbr_mask=lvl.nbr_mask,
                nbr_in_idx=lvl.nbr_in_idx,
                nbr_in_mask=lvl.nbr_in_mask,
                edge_feat=efs.get(i_level), mask=lvl.node_mask,
                train=train)
            up_outputs.append(x)

        if self.output_stage_wise:
            # features for levels 1..L (low to high)
            return [x] + up_outputs[::-1][1:] + [down_outputs[-1]]
        return x
