"""Import reference Superpoint Transformer checkpoints.

Maps the torch `state_dict` of a reference Lightning checkpoint
(SemanticSegmentationModule over the SPT backbone — reference
src/models/semantic.py:35, src/models/components/spt.py:14) onto this
framework's flax params pytree for
`models.semantic.SemanticSegmentationModel` with the SAME
architecture hyperparameters. This is the migration path for users
switching from the reference with trained weights in hand.

Name correspondence (derived from the reference module definitions —
torch module attribute names are deterministic):

    ours (flax)                          reference (torch)
    ------------------------------------ ---------------------------
    head_{i}/classifier/kernel           head.{i}.classifier.weight^T
    net/first_stage/...                  net.first_stage....
    net/down_stage_{i}/...               net.down_stages.{i}....
    net/up_stage_{i}/...                 net.up_stages.{i}....
    net/node_mlp_{i}|h_edge_mlp_{i}|     net.node_mlps.{i}|
        v_edge_mlp_{i}/...                   h_edge_mlps.{i}|...
    .../in_mlp|out_mlp/linear_{k}        ....in_mlp|out_mlp.mlp.{j}
        (j = k*(3 if normed else 2):         (reference mlp() builds
         Linear/Norm/Activation triples       [Linear, Norm, Act] per
         — src/nn/mlp.py:40-57)               layer in a ModuleList)
    .../norm_{k}                         ....mlp.{j+1} (GraphNorm:
                                              weight/bias/mean_scale)
    .../block_{b}/sa_norm|ffn_norm       ....transformer_blocks.{b}.
                                              sa_norm|ffn_norm
    .../block_{b}/sa/qkv|out_proj|       ....transformer_blocks.{b}.
        k_rpe|q_rpe|v_rpe                     sa.qkv|out_proj|k_rpe|..
    .../ffn/linear_{k}                   ....ffn.mlp.{2k} (FFN: no
                                              norm, act between)

torch `nn.Linear.weight` is [out, in]; flax Dense kernels are
[in, out] — transposed on import. Index-based norms carry identical
parameter names on both sides (weight / bias / mean_scale for
GraphNorm).

Covered model families (round-trip tests in tests/test_import_ckpt.py):
  - flagship + nano semantic (nano first_stage is a Stage, reference
    spt.py:487 — same key grammar, no PointStage)
  - SuperCluster panoptic: `edge_affinity_head` FFN on the task module
    (reference panoptic.py:257-258 -> edge_affinity_head.mlp.{0,2}.*)
  - EZ-SP: sparse-CNN weights under net.first_stage.cnn_blocks.{i}
    (.conv.kernel [K, in, out] reshaped to our [K*in, out] gather-
    matmul layout, .norm.* GraphNorm), importable both into the SPT
    point stage (stage-2) and the standalone PartitionModel (stage-1,
    reference load convention src/transforms/point.py:724-726)
"""
import re

import numpy as np

__all__ = ['import_reference_checkpoint', 'reference_key_for']


def _tree_paths(params, prefix=()):
    if isinstance(params, dict):
        for k, v in params.items():
            yield from _tree_paths(v, prefix + (k,))
    else:
        yield prefix, params


_STAGE = {
    'first_stage': 'first_stage',
}


def _stage_key(name):
    if name == 'first_stage':
        return 'first_stage'
    m = re.fullmatch(r'down_stage_(\d+)', name)
    if m:
        return f'down_stages.{m.group(1)}'
    m = re.fullmatch(r'up_stage_(\d+)', name)
    if m:
        return f'up_stages.{m.group(1)}'
    m = re.fullmatch(r'(node|h_edge|v_edge)_mlp_(\d+)', name)
    if m:
        return f'{m.group(1)}_mlps.{m.group(2)}'
    m = re.fullmatch(r'(node|h_edge|v_edge)_mlp_shared', name)
    if m:
        return f'{m.group(1)}_mlps.0'
    return None


def _mlp_module_index(kind, k, normed):
    """Position of linear_{k} / norm_{k} inside the reference MLP's
    flat ModuleList (Linear[, Norm][, Act] per layer)."""
    per = 3 if normed else 2
    base = per * k
    return base if kind == 'linear' else base + 1


def reference_key_for(path, normed_mlps=True):
    """Reference state_dict key for one of our param paths (tuple of
    str, starting at the model root, ending with the param name).
    Returns None for params with no reference counterpart."""
    path = list(path)
    leaf = path.pop()
    ref_leaf = {'kernel': 'weight'}.get(leaf, leaf)

    # classifier heads live on the task module, not the backbone
    m = re.fullmatch(r'head_(\d+)', path[0]) if path else None
    if m and path[1:] == ['classifier']:
        return f'head.{m.group(1)}.classifier.{ref_leaf}'
    if path and path[0] == 'head' and path[1:] == ['classifier']:
        return f'head.classifier.{ref_leaf}'

    # SuperCluster edge-affinity head: an FFN on the task module
    # (reference src/models/panoptic.py:257-258
    # `self.edge_affinity_head = FFN(out_dim*2, hidden_dim=32,
    # out_dim=1)` -> keys edge_affinity_head.mlp.{0,2}.*)
    if path and path[0] == 'edge_affinity_head':
        m = re.fullmatch(r'linear_(\d+)', path[1]) if path[1:] else None
        if m:
            j = _mlp_module_index('linear', int(m.group(1)),
                                  normed=False)
            return f'edge_affinity_head.mlp.{j}.{ref_leaf}'
        return None

    # EZ-SP stage-1 PartitionModel: our params root is {'cnn': ...};
    # the reference trains the same weights as net.first_stage
    # .cnn_blocks inside a PartitionAndSemanticModule ckpt (reference
    # src/nn/stage.py:714 + the `net.first_stage.` strip convention in
    # src/transforms/point.py:724-726)
    if path and path[0] == 'cnn':
        return _cnn_key(['net', 'first_stage'], path[1:], leaf,
                        ref_leaf)

    if not path or path[0] != 'net':
        return None
    parts = ['net']
    i = 1
    stage = _stage_key(path[i])
    if stage is None:
        return None
    parts.append(stage)
    i += 1

    # EZ-SP stage-2: PointStage with a sparse CNN front
    # (reference src/nn/stage.py:714 self.cnn_blocks = SparseCNN(...))
    rest = path[i:]
    if rest and rest[0] == 'cnn':
        return _cnn_key(parts, rest[1:], leaf, ref_leaf)

    # hf MLPs: our module IS the MLP; stages nest in_mlp/out_mlp
    if rest and rest[0] in ('in_mlp', 'out_mlp'):
        parts.append(rest[0])
        rest = rest[1:]
        return _mlp_rest(parts, rest, ref_leaf, normed_mlps)
    if re.fullmatch(r'(node|h_edge|v_edge)_mlps\.\d+', stage):
        return _mlp_rest(parts, rest, ref_leaf, normed_mlps)

    m = re.fullmatch(r'block_(\d+)', rest[0]) if rest else None
    if m:
        parts.append(f'transformer_blocks.{m.group(1)}')
        rest = rest[1:]
        if rest[0] in ('sa_norm', 'ffn_norm'):
            parts.append(rest[0])
            return '.'.join(parts) + '.' + ref_leaf
        if rest[0] == 'sa':
            parts.append('sa')
            parts.append(rest[1])    # qkv|out_proj|k_rpe|q_rpe|v_rpe
            return '.'.join(parts) + '.' + ref_leaf
        if rest[0] == 'ffn':
            parts.append('ffn')
            m2 = re.fullmatch(r'linear_(\d+)', rest[1])
            j = _mlp_module_index('linear', int(m2.group(1)),
                                  normed=False)
            parts.append(f'mlp.{j}')
            return '.'.join(parts) + '.' + ref_leaf
    return None


def _cnn_key(parts, rest, leaf, ref_leaf):
    """Sparse-CNN block params. Reference layout (src/nn/sparse.py:14
    ConvBlock inside the SparseCNN ModuleList): cnn_blocks.{i}.conv
    .kernel|bias (torchsparse Conv3d param is literally 'kernel') and
    cnn_blocks.{i}.norm.* (GraphNorm). Ours: cnn/block_{i}/kernel|bias
    + an auto-named flax norm submodule (GraphNorm_0 etc.)."""
    if not rest:
        return None
    m = re.fullmatch(r'block_(\d+)', rest[0])
    if not m:
        return None
    base = '.'.join(parts) + f'.cnn_blocks.{m.group(1)}'
    mid = rest[1:]
    if not mid:
        if leaf in ('kernel', 'bias'):
            return f'{base}.conv.{leaf}'
        return None
    if len(mid) == 1 and re.fullmatch(r'[A-Za-z]*Norm_\d+', mid[0]):
        return f'{base}.norm.{ref_leaf}'
    return None


def _mlp_rest(parts, rest, ref_leaf, normed):
    m = re.fullmatch(r'(linear|norm)_(\d+)', rest[0])
    if not m:
        return None
    j = _mlp_module_index(m.group(1), int(m.group(2)), normed)
    parts.append(f'mlp.{j}')
    return '.'.join(parts) + '.' + ref_leaf


def import_reference_checkpoint(ckpt, params, strict=True,
                                verbose=False):
    """Fill our params pytree from a reference checkpoint.

    :param ckpt: path to a reference Lightning .ckpt / .pt file, or an
        already-loaded torch state_dict (dict of name -> tensor/array)
    :param params: our model's params pytree (from model.init), used
        as the shape/structure template
    :param strict: raise if any of our params has no source key or a
        shape mismatch; otherwise keep the init value and warn
    :return: (new_params, report) — report lists mapped / missing /
        unused keys
    """
    if isinstance(ckpt, (str, bytes)):
        import torch
        blob = torch.load(ckpt, map_location='cpu',
                          weights_only=False)
        state = blob.get('state_dict', blob)
    else:
        state = ckpt
    state = {k: np.asarray(getattr(v, 'numpy', lambda: v)())
             for k, v in state.items()}

    mapped, missing = {}, []
    used = set()
    for path, value in _tree_paths(params):
        key = reference_key_for(path)
        src = state.get(key) if key else None
        if src is None:
            missing.append('/'.join(path))
            continue
        if path[-1] == 'kernel':
            if key.endswith('.conv.kernel'):
                # torchsparse Conv3d kernels: [K, in, out] for K>1
                # (flatten to our [K*in, out] gather-matmul layout);
                # 1x1 convs are stored [in, out] already
                if src.ndim == 3:
                    src = src.reshape(-1, src.shape[-1])
            else:
                src = src.T
        if src.shape != tuple(np.shape(value)):
            raise ValueError(
                f"shape mismatch for {'/'.join(path)} <- {key}: "
                f"{src.shape} vs {np.shape(value)}")
        mapped['/'.join(path)] = src.astype(np.asarray(value).dtype)
        used.add(key)

    ignorable = re.compile(
        r'^(criterion|train_|val_|test_|.*num_batches_tracked'
        r'|.*running_(mean|var))')
    unused = [k for k in state
              if k not in used and not ignorable.match(k)]
    if missing and strict:
        raise ValueError(
            f'{len(missing)} params with no reference source, e.g. '
            f'{missing[:5]}')

    def fill(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: fill(v, prefix + (k,)) for k, v in tree.items()}
        key = '/'.join(prefix)
        return mapped.get(key, tree)

    new_params = fill(params)
    report = {'mapped': sorted(mapped), 'missing': sorted(missing),
              'unused_reference_keys': sorted(unused)}
    if verbose:
        print(f"imported {len(mapped)} tensors; "
              f"{len(missing)} unmapped params; "
              f"{len(unused)} unused reference keys")
    return new_params, report
