"""MLP / FFN / Classifier (flax.linen), mirroring reference
src/nn/mlp.py: Linear-Norm-Activation stacks where the norm may be
index-based (GraphNorm etc., fed the per-node graph id) and Linear
layers drop their bias when a norm follows.
"""
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norm import GraphNorm

__all__ = ['MLP', 'FFN', 'Classifier', 'leaky_relu']


def leaky_relu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.01)


_XAVIER_GAIN_LEAKY = 1.4140664   # torch calculate_gain('leaky_relu')


def xavier_uniform_gain(gain=_XAVIER_GAIN_LEAKY):
    """Torch-style xavier_uniform with gain (reference
    src/utils/nn.py:_linear_init uses gain=calculate_gain('leaky_relu'))."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        a = gain * (6.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.uniform(key, shape, dtype, -a, a)
    return init


class MLP(nn.Module):
    """Linear(-Norm)(-Act) stack over [N, D] node features."""
    dims: Sequence[int]          # full channel list incl. input dim
    activation: Callable = leaky_relu
    last_activation: bool = True
    norm: Optional[str] = 'graph'   # 'graph'|'layer'|'batch'|None
    last_norm: bool = True
    drop: Optional[float] = None
    num_graphs: int = 64
    # 'bfloat16' runs the Dense/activation chain in bf16 (params and
    # norm statistics stay fp32); the output is cast back to fp32
    compute_dtype: Optional[str] = None
    shard_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, batch=None, mask=None, train=True):
        import jax.numpy as jnp
        dt = jnp.bfloat16 if self.compute_dtype in (
            'bf16', 'bfloat16') else None
        if dt is not None:
            x = x.astype(dt)
        dims = list(self.dims)
        assert len(dims) >= 2
        use_bias = self.norm is None
        n_layers = len(dims) - 1
        for i in range(1, len(dims)):
            x = nn.Dense(dims[i], use_bias=use_bias, dtype=dt,
                         kernel_init=xavier_uniform_gain(),
                         name=f'linear_{i - 1}')(x)
            last = i == n_layers
            if self.norm is not None and (self.last_norm or not last):
                norm = self._make_norm(dims[i], f'norm_{i - 1}')
                from .norm import BatchNorm
                if isinstance(norm, BatchNorm):
                    x = norm(x, batch=batch, mask=mask, train=train)
                else:
                    x = norm(x, batch=batch, mask=mask)
            if self.activation is not None and \
                    (self.last_activation or not last):
                x = self.activation(x)
        if self.drop is not None and self.drop > 0:
            x = nn.Dropout(self.drop, deterministic=not train)(x)
        if dt is not None:
            x = x.astype(jnp.float32)
        return x

    def _make_norm(self, dim, name):
        from .norm import LayerNorm, InstanceNorm, GroupNorm
        if self.norm == 'graph':
            return GraphNorm(dim, num_graphs=self.num_graphs,
                             shard_axis=self.shard_axis, name=name)
        if self.norm == 'layer':
            return LayerNorm(dim, num_graphs=self.num_graphs,
                             shard_axis=self.shard_axis, name=name)
        if self.norm == 'instance':
            return InstanceNorm(dim, num_graphs=self.num_graphs,
                                shard_axis=self.shard_axis, name=name)
        if self.norm == 'group':
            return GroupNorm(dim, num_graphs=self.num_graphs, name=name)
        if self.norm == 'batch':
            from .norm import BatchNorm
            return BatchNorm(dim, shard_axis=self.shard_axis, name=name)
        raise ValueError(f'Unknown norm {self.norm}')

    @property
    def out_dim(self):
        return self.dims[-1]


class FFN(nn.Module):
    """Transformer feed-forward: 2 Linear layers, no norm, no last
    activation (reference src/nn/mlp.py:97)."""
    dim: int
    hidden_dim: Optional[int] = None
    out_dim: Optional[int] = None
    activation: Callable = leaky_relu
    drop: Optional[float] = None

    @nn.compact
    def __call__(self, x, train=True):
        hidden = self.hidden_dim or self.dim
        out = self.out_dim or self.dim
        x = nn.Dense(hidden, use_bias=True,
                     kernel_init=xavier_uniform_gain(), name='linear_0')(x)
        x = self.activation(x)
        x = nn.Dense(out, use_bias=True,
                     kernel_init=xavier_uniform_gain(), name='linear_1')(x)
        if self.drop is not None and self.drop > 0:
            x = nn.Dropout(self.drop, deterministic=not train)(x)
        return x


class Classifier(nn.Module):
    """Plain linear head (reference src/nn/mlp.py:128)."""
    num_classes: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.num_classes, use_bias=True,
                        kernel_init=xavier_uniform_gain(),
                        name='classifier')(x)
