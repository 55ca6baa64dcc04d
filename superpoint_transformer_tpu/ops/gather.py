"""Gather with a gather-based backward.

`table[nbr_idx]` differentiates to a scatter-add over the neighbor
indices — which lowers to a SERIAL scatter on TPU (the train-step
profile showed the attention k/v gather backward dominating the whole
backward pass). With the transpose neighbor table built at batch prep
(`PaddedLevel.nbr_in_idx/nbr_in_mask`: for each node, the flattened
[N*K] slots that reference it), the backward becomes a dense gather +
masked sum over incoming slots — pure vector work.
"""
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ['gather_rows_t']


@jax.custom_vjp
def gather_rows_t(table, nbr_idx, in_idx, in_mask):
    """`table[nbr_idx]` whose backward uses the transpose table.

    :param table: [N, C]
    :param nbr_idx: [N, K] int — rows to gather
    :param in_idx: [N, K_in] int — flattened [N*K] slot ids whose
        nbr_idx entry equals the row (padding points at slot 0)
    :param in_mask: [N, K_in] bool — slot validity
    :return: [N, K, C]
    """
    return table[nbr_idx]


def _fwd(table, nbr_idx, in_idx, in_mask):
    return table[nbr_idx], (nbr_idx, in_idx, in_mask)


def _bwd(res, g):
    nbr_idx, in_idx, in_mask = res
    N, K, C = g.shape
    gf = g.reshape(N * K, C)
    inc = gf[in_idx]                                  # [N, K_in, C]
    dtable = jnp.sum(
        inc * in_mask[:, :, None].astype(inc.dtype), axis=1)
    return dtable, None, None, None


gather_rows_t.defvjp(_fwd, _bwd)
