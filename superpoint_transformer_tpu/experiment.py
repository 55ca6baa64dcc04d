"""Experiment builder: config -> (datasets, task, batch config).

Performs the channel-size derivations the reference encodes as
`${eval:...}` YAML interpolations (configs/model/semantic/default.yaml
:45-70, _down.yaml, _up.yaml, _features.yaml) in plain code.
"""
import numpy as np

from .config.loader import Config
from .models.spt import SPT
from .models.semantic import SemanticTask
from .transforms.prepare import BatchConfig

__all__ = ['FEAT_SIZE', 'build_model', 'build_task', 'build_datasets',
           'build_batch_config', 'precision_to_dtype']


def precision_to_dtype(precision):
    """Map a `trainer.precision` config value to the model's
    `compute_dtype` (reference configs/trainer/default.yaml precision
    knob, Lightning '16-mixed'/'bf16-mixed'/32 grammar). On TPU both
    '16' and 'bf16' select bfloat16 (the MXU's native half type);
    32-bit values select full float32 (compute_dtype=None)."""
    if precision is None:
        return None
    p = str(precision).lower()
    if 'bf16' in p or p in ('16', '16-mixed', '16-true'):
        return 'bfloat16'
    if p in ('32', '32-true', 'fp32', 'float32'):
        return None
    raise ValueError(
        f"unknown trainer.precision {precision!r} "
        "(expected one of: 32, 16, bf16, bf16-mixed, 16-mixed)")

FEAT_SIZE = {
    'pos': 3, 'pos_room': 3, 'rgb': 3, 'hsv': 3, 'lab': 3,
    'density': 1, 'linearity': 1, 'planarity': 1, 'scattering': 1,
    'verticality': 1, 'normal': 3, 'length': 1, 'surface': 1,
    'volume': 1, 'curvature': 1, 'elevation': 1, 'size': 1,
    'intensity': 1, 'mean_off': 3, 'std_off': 3, 'mean_dist': 1,
    'angle_source': 1, 'angle_target': 1, 'centroid_dir': 3,
    'centroid_dist': 1, 'normal_angle': 1, 'log_length': 1,
    'log_surface': 1, 'log_volume': 1, 'log_size': 1,
}
for _k in list(FEAT_SIZE):
    FEAT_SIZE.setdefault('mean_' + _k, FEAT_SIZE[_k])
    FEAT_SIZE.setdefault('std_' + _k, FEAT_SIZE[_k])
    FEAT_SIZE.setdefault('log_' + _k, FEAT_SIZE[_k])


def _dims(keys):
    return sum(FEAT_SIZE[k] for k in keys)


def build_model(cfg: Config, num_graphs=8, compute_dtype='auto') -> SPT:
    dm, m = cfg.datamodule, cfg.model
    if compute_dtype == 'auto':
        # trainer.precision flows into the model compute dtype so the
        # CLI builds the exact model the benchmarks time (bf16 matmuls
        # with fp32 statistics — see nn/mlp.py, nn/attention.py)
        trainer_cfg = cfg.get('trainer')
        compute_dtype = precision_to_dtype(
            trainer_cfg.get('precision') if trainer_cfg else None)
    net = m.net
    nano = bool(net.nano)
    use_pos = bool(net.use_pos)
    use_diam = bool(net.use_diameter)
    use_diam_p = bool(net.use_diameter_parent)

    num_hf_point = _dims(dm.point_hf)
    segment_hf = (list(dm.segment_base_hf)
                  + ['mean_' + k for k in dm.segment_mean_hf]
                  + ['std_' + k for k in dm.segment_std_hf])
    num_hf_segment = _dims(segment_hf)
    num_hf_edge = _dims(dm.edge_hf)
    num_hf_v_edge = _dims(dm.v_edge_hf)

    point_injection = 3 * use_pos + use_diam_p
    point_hf_dim = num_hf_point + point_injection

    node_mlp_out = m.get('_node_mlp_out')
    h_edge_mlp_out = m.get('_h_edge_mlp_out')
    v_edge_mlp_out = m.get('_v_edge_mlp_out')
    use_node_hf = bool(net.use_node_hf)
    node_hf_dim = num_hf_segment if use_node_hf else 0
    node_injection = (3 * use_pos + use_diam + use_diam_p
                      + (node_mlp_out if (node_mlp_out and use_node_hf
                                          and node_hf_dim > 0)
                         else node_hf_dim))

    depth = int(m.get('_mlp_depth', 2))
    down_dim = list(m._down_dim)
    up_dim = list(m._up_dim)
    point_mlp_cfg = m.get('_point_mlp')
    point_out = point_mlp_cfg[-1] if point_mlp_cfg else down_dim[0]

    down_in_mlp = []
    for i, d in enumerate(down_dim):
        if i == 0:
            prev = (point_out if not nano
                    else (num_hf_segment if not use_node_hf else 0))
            first_in = node_injection + (point_out if not nano else 0) \
                + (num_hf_segment if (nano and not use_node_hf) else 0)
            down_in_mlp.append([first_in] + [d] * depth)
        else:
            down_in_mlp.append(
                [node_injection + down_dim[i - 1]] + [d] * depth)

    up_in_mlp = []
    for i, d in enumerate(up_dim):
        prev = down_dim[-1] if i == 0 else up_dim[i - 1]
        skip = down_dim[-(2 + i)]
        up_in_mlp.append([node_injection + prev + skip] + [d] * depth)

    node_mlp = ([node_hf_dim] + [node_mlp_out] * depth
                if node_mlp_out and use_node_hf and node_hf_dim > 0
                else None)
    h_edge_mlp = ([num_hf_edge] + [h_edge_mlp_out] * depth
                  if h_edge_mlp_out and num_hf_edge > 0 else None)
    v_edge_mlp = ([num_hf_v_edge] + [v_edge_mlp_out] * depth
                  if v_edge_mlp_out and num_hf_v_edge > 0 else None)
    in_rpe_dim = h_edge_mlp_out if h_edge_mlp else num_hf_edge

    return SPT(
        point_mlp=(tuple([point_hf_dim] + list(point_mlp_cfg))
                   if point_mlp_cfg and not nano else None),
        nano=nano,
        down_dim=tuple(down_dim),
        down_in_mlp=tuple(tuple(x) for x in down_in_mlp),
        down_num_heads=int(net.down_num_heads),
        down_num_blocks=int(net.down_num_blocks),
        down_ffn_ratio=float(net.down_ffn_ratio),
        up_dim=tuple(up_dim),
        up_in_mlp=tuple(tuple(x) for x in up_in_mlp),
        up_num_heads=int(net.up_num_heads),
        up_num_blocks=int(net.up_num_blocks),
        up_ffn_ratio=float(net.up_ffn_ratio),
        node_mlp=tuple(node_mlp) if node_mlp else None,
        h_edge_mlp=tuple(h_edge_mlp) if h_edge_mlp else None,
        v_edge_mlp=tuple(v_edge_mlp) if v_edge_mlp else None,
        qk_dim=int(net.qk_dim), qkv_bias=bool(net.qkv_bias),
        qk_scale=net.qk_scale, in_rpe_dim=int(in_rpe_dim),
        pre_norm=bool(net.pre_norm), no_sa=bool(net.no_sa),
        no_ffn=bool(net.no_ffn), k_rpe=bool(net.k_rpe),
        q_rpe=bool(net.q_rpe), v_rpe=bool(net.v_rpe),
        qk_share_rpe=bool(net.qk_share_rpe),
        q_on_minus_rpe=bool(net.q_on_minus_rpe),
        stages_share_rpe=bool(net.stages_share_rpe),
        blocks_share_rpe=bool(net.blocks_share_rpe),
        heads_share_rpe=bool(net.heads_share_rpe),
        use_pos=use_pos, use_node_hf=use_node_hf,
        use_diameter=use_diam, use_diameter_parent=use_diam_p,
        pool=str(net.pool), fusion=str(net.fusion),
        norm_mode=str(net.norm_mode), output_stage_wise=True,
        compute_dtype=compute_dtype, num_graphs=num_graphs)


def build_task(cfg: Config, total_steps=None, class_weight=None,
               num_graphs=None):
    """Build the task matching `model.task`
    ('semantic' | 'panoptic' | 'partition'), mirroring the reference's
    SemanticSegmentationModule / PanopticSegmentationModule /
    PartitionAndSemanticModule instantiation from hydra configs."""
    m = cfg.model
    task_type = str(m.get('task', 'semantic'))
    batch_size = int(cfg.datamodule.dataloader.batch_size)
    ng = num_graphs or max(batch_size, 1)

    if task_type == 'partition':
        from .models.partition import PartitionModel, PartitionTask
        crit = m.get('partition_criterion', {})
        cnn = [int(m.cnn_width)] * int(m.cnn_depth) + [int(m.cnn_out)]
        return PartitionTask(
            net=PartitionModel(channels=tuple(cnn), num_graphs=ng),
            num_classes=int(cfg.datamodule.num_classes),
            affinity_temperature=float(
                crit.get('affinity_temperature', 1.0)),
            adaptive_sampling_ratio=crit.get(
                'adaptive_sampling_ratio', 0.9),
            focal_gamma=float(crit.get('gamma', 1.0)),
            lr=float(m.optimizer.lr),
            weight_decay=float(m.optimizer.weight_decay),
            total_steps=total_steps or 100_000)

    net = build_model(cfg, num_graphs=ng)
    lambdas = list(m.multi_stage_loss_lambdas)
    common = dict(
        net=net,
        num_classes=int(cfg.datamodule.num_classes),
        loss_type=str(m.loss_type),
        multi_stage_loss_lambdas=tuple(lambdas),
        weighted_loss=bool(m.weighted_loss),
        lr=float(m.optimizer.lr),
        weight_decay=float(m.optimizer.weight_decay),
        transformer_lr_scale=float(m.transformer_lr_scale),
        total_steps=total_steps or 100_000,
        warmup_steps=int(m.scheduler.num_warmup),
        scheduler=('plateau' if 'plateau' in str(
            m.scheduler.get('_target_', 'cosine')).lower()
            else 'cosine'),
        class_weight=class_weight,
        accumulate_grad_batches=int(
            cfg.trainer.get('accumulate_grad_batches', 1)))

    if task_type == 'panoptic':
        from .models.panoptic import PanopticTask
        return PanopticTask(
            edge_affinity_loss_lambda=float(
                m.get('edge_affinity_loss_lambda', 1.0)),
            edge_affinity_loss_weights=tuple(
                m.get('edge_affinity_loss_weights', (1., 1., 1., 1.))),
            stuff_classes=tuple(
                cfg.datamodule.get('stuff_classes', ())),
            **common)

    return SemanticTask(**common)


def build_batch_config(cfg: Config) -> BatchConfig:
    dm = cfg.datamodule
    return BatchConfig(
        num_classes=int(dm.num_classes),
        point_hf=tuple(dm.point_hf),
        segment_hf=tuple(list(dm.segment_base_hf)
                         + ['mean_' + k for k in dm.segment_mean_hf]
                         + ['std_' + k for k in dm.segment_std_hf]),
        edge_hf=tuple(dm.edge_hf),
        v_edge_hf=tuple(dm.v_edge_hf),
        use_mean_normal='normal' in dm.segment_mean_hf,
        sample_point_min=int(dm.sample_point_min),
        sample_point_max=int(dm.sample_point_max),
        sample_graph_r=float(dm.sample_graph_r),
        sample_graph_k=int(dm.sample_graph_k),
        sample_graph_max_nodes=int(dm.sample_graph_max_nodes),
        sample_segment_ratio=float(dm.sample_segment_ratio),
        sample_segment_by_size=bool(dm.sample_segment_by_size),
        sample_edge_n_max=int(dm.sample_edge_n_max),
        max_num_nodes=int(dm.max_num_nodes),
        max_num_edges=int(dm.max_num_edges),
        pos_jitter=float(dm.pos_jitter),
        voxel=float(dm.voxel),
        tilt_n_rotate_phi=float(dm.tilt_n_rotate_phi),
        tilt_n_rotate_theta=float(dm.tilt_n_rotate_theta),
        anisotropic_scaling=float(dm.anisotropic_scaling),
        node_feat_jitter=float(dm.node_feat_jitter),
        h_edge_feat_jitter=float(dm.h_edge_feat_jitter),
        rgb_autocontrast=float(dm.rgb_autocontrast),
        rgb_drop=float(dm.rgb_drop),
        nano=bool(dm.nano),
        instance=bool(dm.get('instance', False)),
        instance_k_max=int(dm.get('instance_k_max', 30)),
        instance_radius=float(dm.get('instance_radius', 0.1)))


def _pre_transform_config(cfg: Config):
    dm = cfg.datamodule
    out = dict(
        voxel=float(dm.voxel), knn=int(dm.knn), knn_r=float(dm.knn_r),
        knn_step=int(dm.get('knn_step', -1)),
        knn_min_search=int(dm.get('knn_min_search', 25)),
        knn_backend=str(dm.get('knn_backend', 'host')),
        partition_hf=tuple(dm.partition_hf),
        point_hf_preprocess=tuple(sorted(
            set(list(dm.point_hf) + list(dm.partition_hf)
                + ['normal']) - {'rgb', 'intensity', 'elevation'})),
        pcp_regularization=tuple(dm.pcp_regularization),
        pcp_spatial_weight=tuple(dm.pcp_spatial_weight),
        pcp_cutoff=tuple(dm.pcp_cutoff),
        pcp_k_adjacency=int(dm.pcp_k_adjacency),
        pcp_w_adjacency=float(dm.pcp_w_adjacency),
        graph_k_min=int(dm.graph_k_min),
        graph_k_max=int(dm.graph_k_max),
        graph_gap=tuple(dm.graph_gap),
        ground_threshold=float(dm.ground_threshold),
        ground_scale=float(dm.ground_scale),
        segment_mean_hf=tuple(dm.segment_mean_hf),
        segment_std_hf=tuple(dm.segment_std_hf))
    if dm.get('instance'):
        # instance-aware preprocessing caches separately
        out['with_instances'] = True
    if str(dm.get('graph_builder', 'radius')) != 'radius':
        out['graph_builder'] = str(dm.graph_builder)
        out['graph_delaunay_max_dist'] = dm.get(
            'graph_delaunay_max_dist', -1)
    # EZ-SP stage 2: learned-CNN partition features + greedy
    # contour-prior partition replace cut-pursuit (added only when
    # requested so the default cache hashes stay stable)
    mode = str(dm.get('partition_mode', 'cut_pursuit'))
    if mode != 'cut_pursuit':
        out.update(
            partition_mode=mode,
            pretrained_cnn_ckpt_path=dm.get(
                'pretrained_cnn_ckpt_path'),
            pretrained_cnn_channels=tuple(dm.get(
                'pretrained_cnn_channels', (32, 32, 32))),
            contour_prior_reg=dm.get('contour_prior_reg', 2e-2),
            contour_prior_min_size=tuple(dm.get(
                'contour_prior_min_size', (5, 30, 90))),
            contour_prior_edge_weight_mode=str(dm.get(
                'contour_prior_edge_weight_mode',
                'exp_neg_latent_distance')),
            contour_prior_k_isolated=int(dm.get(
                'contour_prior_k_isolated', 5)))
    return out


def build_datasets(cfg: Config, stages=('train', 'val', 'test')):
    from .datasets import (S3DIS, MiniS3DIS, DALES, MiniDALES,
                           KITTI360, MiniKITTI360, ScanNet,
                           MiniScanNet, S3DISRoom, MiniS3DISRoom)
    dm = cfg.datamodule
    mini = bool(dm.get('mini', False))
    table = {
        's3dis': (S3DIS, MiniS3DIS),
        's3dis_room': (S3DISRoom, MiniS3DISRoom),
        'dales': (DALES, MiniDALES),
        'kitti360': (KITTI360, MiniKITTI360),
        'scannet': (ScanNet, MiniScanNet)}
    cls = table[dm.dataset][1 if mini else 0]
    kwargs = dict(
        pre_transform_config=_pre_transform_config(cfg),
        in_memory=bool(dm.get('in_memory', False)),
        nano=bool(dm.get('nano', False)),
        num_workers=int(dm.get('num_workers', 1)),
        # panoptic configs read gt instances from the raw data
        # (reference datamodule.instance); keys the cache hash below
        instances=bool(dm.get('instance', False)))
    if dm.get('xy_tiling'):
        t = dm.xy_tiling
        kwargs['xy_tiling'] = tuple(t) if not np.isscalar(t) else int(t)
    if dm.get('pc_tiling'):
        kwargs['pc_tiling'] = int(dm.pc_tiling)
    if dm.dataset in ('s3dis', 's3dis_room'):
        kwargs['fold'] = int(dm.get('fold', 5))
    out = {}
    for s in stages:
        out[s] = cls(dm.data_dir, stage=s, **kwargs)
    return out
