"""Debug mode: opt-in structural invariant checks (reference
src/debug.py `set_debug` + the `self.debug()` validations in every
data-structure constructor, src/data/data.py:61, nag.py:52, csr.py:96).

Usage:
    import superpoint_transformer_tpu as spt
    spt.set_debug(True)     # heavy validation on
"""
import numpy as np

__all__ = ['set_debug', 'is_debug_enabled', 'validate_data',
           'validate_nag', 'validate_csr']

_DEBUG = False


def set_debug(flag=True):
    global _DEBUG
    _DEBUG = bool(flag)


def is_debug_enabled():
    return _DEBUG


def validate_csr(csr):
    ptr = np.asarray(csr.pointers)
    assert ptr.ndim == 1 and ptr.shape[0] >= 1, 'bad pointers shape'
    assert ptr[0] == 0, 'pointers must start at 0'
    assert (np.diff(ptr) >= 0).all(), 'pointers must be nondecreasing'
    for v in csr.values:
        assert v.shape[0] == ptr[-1], \
            f'value length {v.shape[0]} != num_items {ptr[-1]}'


def validate_data(data):
    n = data.num_nodes
    for k in data.node_attrs():
        v = data[k]
        if hasattr(v, 'shape'):
            assert v.shape[0] == n, f'{k}: {v.shape[0]} != {n} nodes'
    ei = data.get('edge_index')
    if ei is not None and ei.size:
        assert ei.min() >= 0 and ei.max() < n, 'edge index out of range'
    si = data.get('super_index')
    if si is not None and si.size:
        assert si.min() >= 0, 'negative super_index'
    y = data.get('y')
    if y is not None and y.ndim == 2:
        assert (np.asarray(y) >= 0).all(), 'negative histogram counts'
    sub = data.get('sub')
    if sub is not None:
        validate_csr(sub)
        assert sub.num_groups == n, 'sub groups != nodes'


def validate_nag(nag):
    for i in nag.levels:
        validate_data(nag[i])
    for i in nag.levels[:-1]:
        d = nag[i]
        si = d.get('super_index')
        if si is not None and si.size:
            assert int(si.max()) < nag[i + 1].num_nodes, \
                f'level {i} super_index exceeds level {i + 1} size'
