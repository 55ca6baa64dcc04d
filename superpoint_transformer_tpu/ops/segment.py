"""Segment (scatter) operations.

TPU-native replacements for the reference's torch_scatter /
torch_geometric scatter layer (reference: src/nn/attention.py:307-315,
src/utils/scatter.py). All ops take an explicit static `num_segments`
and support `indices_are_sorted` so XLA can lower sorted reductions
efficiently. Out-of-range indices (used as padding) are dropped by
jax's segment op semantics.
"""
import jax
import jax.numpy as jnp

__all__ = [
    'segment_sum', 'segment_mean', 'segment_max', 'segment_min',
    'segment_std', 'segment_count', 'segment_softmax',
    'segment_mean_weighted', 'segment_csr_arange',
    'gather_rows_small',
]


# Below this segment count, scatter-adds are reformulated as a
# one-hot matmul: TPU lowers segment_sum to a serial scatter (measured
# 26 ms for a 335k-row GraphNorm reduce into 8 graphs vs ~0.2 ms as a
# [N, G] x [N, C] contraction on the MXU).
_ONEHOT_MAX_SEGMENTS = 128


def _onehot_segment_sum(x, idx, num_segments, acc_dtype=None,
                        precision=None):
    """`precision='highest'` forces exact f32 matmul passes — needed
    when the summed values are COUNTS (confusion matrices): TPU's
    default f32 matmul precision rounds inputs to bf16, corrupting
    values past 2^8. Statistics callers keep the fast default."""
    out_dtype = acc_dtype or x.dtype
    oh = (idx[:, None] == jnp.arange(num_segments, dtype=idx.dtype)
          [None, :])
    # accumulate in f32 regardless of the streamed dtype (bf16 inputs
    # keep f32-exact statistics without materializing f32 copies)
    if x.ndim == 1:
        out = jnp.einsum('ng,n->g', oh.astype(x.dtype), x,
                         preferred_element_type=jnp.float32,
                         precision=precision)
        return out.astype(out_dtype)
    flat = x.reshape(x.shape[0], -1)
    out = jnp.einsum('ng,nc->gc', oh.astype(x.dtype), flat,
                     preferred_element_type=jnp.float32,
                     precision=precision)
    return out.reshape((num_segments,) + x.shape[1:]).astype(out_dtype)


def segment_sum(x, idx, num_segments, indices_are_sorted=False,
                acc_dtype=None):
    """`acc_dtype` (e.g. jnp.float32 under bf16 activations) selects
    the accumulation/output dtype without materializing an upcast
    input copy."""
    # float-only: an integer sum routed through an fp32 contraction
    # would lose exactness past 2^24 (e.g. confmat masses on big tiles)
    if num_segments <= _ONEHOT_MAX_SEGMENTS and x.shape[0] >= 1024 \
            and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
        return _onehot_segment_sum(jnp.asarray(x), idx, num_segments,
                                   acc_dtype=acc_dtype)
    if acc_dtype is not None:
        x = jnp.asarray(x).astype(acc_dtype)
    return jax.ops.segment_sum(
        x, idx, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def segment_count(idx, num_segments, indices_are_sorted=False, mask=None):
    """Number of elements per segment. `mask` marks valid rows."""
    n = idx.shape[0]
    if num_segments <= _ONEHOT_MAX_SEGMENTS and 1024 <= n < 2 ** 24:
        # ones-matmul on the MXU; exact in fp32 since counts <= N < 2^24
        ones = jnp.ones(n, dtype=jnp.float32)
        if mask is not None:
            ones = ones * mask.astype(jnp.float32)
        return _onehot_segment_sum(ones, idx, num_segments).astype(
            jnp.int32)
    ones = jnp.ones(n, dtype=jnp.int32)
    if mask is not None:
        ones = ones * mask.astype(jnp.int32)
    return jax.ops.segment_sum(
        ones, idx, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def segment_mean(x, idx, num_segments, indices_are_sorted=False, mask=None):
    if mask is not None:
        x = x * _expand(mask, x).astype(x.dtype)
    s = segment_sum(x, idx, num_segments, indices_are_sorted)
    n = segment_count(idx, num_segments, indices_are_sorted, mask=mask)
    n = jnp.maximum(n, 1).astype(x.dtype)
    return s / _expand(n, s)


def segment_max(x, idx, num_segments, indices_are_sorted=False):
    return jax.ops.segment_max(
        x, idx, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def segment_min(x, idx, num_segments, indices_are_sorted=False):
    return jax.ops.segment_min(
        x, idx, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def segment_std(x, idx, num_segments, indices_are_sorted=False, mask=None,
                correction=1):
    """Per-segment standard deviation, matching torch_scatter's
    `scatter_std` (Bessel-corrected by default, as used by
    reference src/transforms/graph.py:259 SegmentFeatures).
    """
    if mask is not None:
        x = x * _expand(mask, x).astype(x.dtype)
    n = segment_count(idx, num_segments, indices_are_sorted, mask=mask)
    n = n.astype(x.dtype)
    s = segment_sum(x, idx, num_segments, indices_are_sorted)
    mean = s / _expand(jnp.maximum(n, 1), s)
    d = x - mean[idx]
    if mask is not None:
        d = d * _expand(mask, d).astype(d.dtype)
    var = segment_sum(d * d, idx, num_segments, indices_are_sorted)
    denom = jnp.maximum(n - correction, 1)
    var = var / _expand(denom, var)
    return jnp.sqrt(jnp.maximum(var, 0))


def segment_softmax(x, idx, num_segments, indices_are_sorted=False,
                    mask=None):
    """Numerically-stable softmax over elements sharing a segment id
    (replaces torch_geometric.utils.softmax, reference
    src/nn/attention.py:307). `mask` marks valid rows; masked rows get
    weight 0.
    """
    if mask is not None:
        neg = jnp.asarray(-jnp.inf, x.dtype)
        x = jnp.where(_expand(mask, x), x, neg)
    m = jax.ops.segment_max(
        x, idx, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)
    m = jnp.where(jnp.isfinite(m), m, 0)
    e = jnp.exp(x - m[idx])
    if mask is not None:
        e = e * _expand(mask, e).astype(e.dtype)
    z = segment_sum(e, idx, num_segments, indices_are_sorted)
    z = jnp.maximum(z, jnp.finfo(e.dtype).tiny)
    return e / z[idx]


def segment_mean_weighted(x, idx, w, num_segments, indices_are_sorted=False):
    """Weighted per-segment mean (reference src/utils/scatter.py:17).
    Zero-weight segments fall back to unweighted mean semantics of the
    reference: w is clamped so the denominator is >= 1."""
    w = w.astype(x.dtype).reshape(-1)
    s = segment_sum(x * w[:, None], idx, num_segments, indices_are_sorted)
    z = segment_sum(w, idx, num_segments, indices_are_sorted)
    z = jnp.where(z == 0, 1, z)
    return s / z[:, None]


def segment_csr_arange(pointers, total):
    """For CSR pointers, return for each element its rank within its
    segment: [0..n0-1, 0..n1-1, ...]. `total` is the static number of
    elements."""
    n = pointers.shape[0] - 1
    seg_id = jnp.searchsorted(
        pointers, jnp.arange(total, dtype=pointers.dtype), side='right') - 1
    seg_id = jnp.clip(seg_id, 0, n - 1)
    return jnp.arange(total) - pointers[seg_id], seg_id


def _expand(v, like):
    """Broadcast a 1D per-row vector against `like`'s trailing dims."""
    return v.reshape(v.shape + (1,) * (like.ndim - v.ndim))


def gather_rows_small(table, idx, num_rows):
    """`table[idx]` for a SMALL float table ([G, C], G <= 128) as a
    one-hot MXU contraction. Mathematically exact (one nonzero 0/1
    weight per output row), and — the actual point — its transpose is
    also a matmul: `jax.grad` of a plain `table[idx]` lowers the
    cotangent scatter-add to a serial TPU scatter (~26 ms for a
    335k-row table in round-1 measurements), while this form
    backpropagates as `one_hot.T @ g` on the MXU. Used by the
    index-based norms' apply phase (the per-graph mean/inv-std
    broadcasts), whose backward dominates the train step otherwise.
    """
    if num_rows > _ONEHOT_MAX_SEGMENTS \
            or not jnp.issubdtype(jnp.asarray(table).dtype,
                                  jnp.floating):
        return table[idx]
    oh = (idx[:, None]
          == jnp.arange(num_rows, dtype=idx.dtype)[None, :])
    flat = table.reshape(num_rows, -1)
    out = jnp.einsum('ng,gc->nc', oh.astype(flat.dtype), flat,
                     preferred_element_type=flat.dtype)
    return out.reshape((idx.shape[0],) + table.shape[1:])
