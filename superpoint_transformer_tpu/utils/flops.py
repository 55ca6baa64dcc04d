"""Analytical model-FLOP counting for MFU estimates.

XLA's `compiled.cost_analysis()['flops']` counts every elementwise op
on padded buffers and overestimates matmul-bound models several-fold
(measured ~5x on the SPT forward), which makes MFU read > 100%. Here
we count only the contraction FLOPs (dot_general / conv) by walking
the jaxpr — the standard "model FLOPs" convention (2*M*N*K per
matmul). Pallas kernels are opaque to the walker, so fused-attention
FLOPs are NOT counted; the estimate is therefore conservative
(reported MFU is a lower bound).
"""
import numpy as np

__all__ = ['matmul_flops']


def _dot_general_flops(eqn):
    a = eqn.invars[0].aval
    b = eqn.invars[1].aval
    ((lc, rc), (lb, rb)) = eqn.params['dimension_numbers']
    batch = int(np.prod([a.shape[i] for i in lb], dtype=np.int64)) \
        if lb else 1
    k = int(np.prod([a.shape[i] for i in lc], dtype=np.int64)) \
        if lc else 1
    m = int(np.prod([a.shape[i] for i in range(len(a.shape))
                     if i not in lc and i not in lb], dtype=np.int64))
    n = int(np.prod([b.shape[i] for i in range(len(b.shape))
                     if i not in rc and i not in rb], dtype=np.int64))
    return 2 * batch * m * k * n


def _conv_flops(eqn):
    # 2 * output_elements * (input_channels/groups) * kernel_spatial
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    groups = int(eqn.params.get('feature_group_count', 1))
    dn = eqn.params['dimension_numbers']
    k_spatial = int(np.prod([rhs.shape[i] for i in dn.rhs_spec[2:]],
                            dtype=np.int64))
    c_in = rhs.shape[dn.rhs_spec[1]]
    n_out = int(np.prod(out.shape, dtype=np.int64))
    return 2 * n_out * (c_in // max(groups, 1)) * k_spatial


def _walk(jaxpr, total):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == 'dot_general':
            total[0] += _dot_general_flops(eqn)
        elif name == 'conv_general_dilated':
            total[0] += _conv_flops(eqn)
        # recurse into sub-jaxprs (pjit, scan, cond, while, remat, ...)
        for v in eqn.params.values():
            for sub in _subjaxprs(v):
                # scan bodies execute `length` times
                mult = eqn.params.get('length', 1) \
                    if name == 'scan' else 1
                inner = [0]
                _walk(sub, inner)
                total[0] += inner[0] * int(mult)


def _subjaxprs(v):
    # duck-typed: a ClosedJaxpr exposes `.jaxpr`, a Jaxpr exposes
    # `.eqns` (stable across jax versions / private-module moves)
    out = []
    items = v if isinstance(v, (tuple, list)) else [v]
    for it in items:
        inner = getattr(it, 'jaxpr', it)
        if hasattr(inner, 'eqns'):
            out.append(inner)
    return out


def matmul_flops(fn, *args, **kwargs):
    """Total contraction FLOPs of one call of `fn(*args)` (host-side
    trace only; nothing runs on device)."""
    import jax
    jaxpr = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
    total = [0]
    _walk(jaxpr.jaxpr, total)
    return total[0]
