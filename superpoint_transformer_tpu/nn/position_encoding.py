"""Position encodings / injections (reference
src/nn/position_encoding.py:17-144): ways of combining node positions
(normalized by UnitSphereNorm upstream) with node features before a
stage's input MLP. All are static-shape jit-friendly.
"""
import jax.numpy as jnp
from flax import linen as nn

from .mlp import MLP, xavier_uniform_gain

__all__ = ['CatInjection', 'AdditiveInjection', 'MLPInjection',
           'FourierInjection', 'LearnableFourierInjection',
           'injection_factory']


class CatInjection(nn.Module):
    """x <- [pos | x] (the reference default)."""
    @nn.compact
    def __call__(self, pos, x, batch=None, mask=None, train=True):
        return pos if x is None else jnp.concatenate([pos, x], axis=1)


class AdditiveInjection(nn.Module):
    """x <- x + Linear(pos) (projects pos to the feature width)."""
    @nn.compact
    def __call__(self, pos, x, batch=None, mask=None, train=True):
        if x is None:
            return pos
        p = nn.Dense(x.shape[1], use_bias=False,
                     kernel_init=xavier_uniform_gain(),
                     name='proj')(pos)
        return x + p


class MLPInjection(nn.Module):
    """x <- x + MLP(pos)."""
    hidden: int = 32
    num_graphs: int = 64

    @nn.compact
    def __call__(self, pos, x, batch=None, mask=None, train=True):
        if x is None:
            return pos
        p = MLP((pos.shape[1], self.hidden, x.shape[1]),
                num_graphs=self.num_graphs, name='mlp')(
            pos, batch=batch, mask=mask, train=train)
        return x + p


class FourierInjection(nn.Module):
    """x <- [fourier(pos) | x]: fixed log-spaced sin/cos features per
    axis (reference FourierPositionEncoding)."""
    num_bands: int = 8
    max_freq: float = 32.0

    @nn.compact
    def __call__(self, pos, x, batch=None, mask=None, train=True):
        freqs = jnp.exp(jnp.linspace(
            0.0, jnp.log(self.max_freq), self.num_bands))
        ang = pos[:, :, None] * freqs[None, None, :] * jnp.pi
        enc = jnp.concatenate(
            [jnp.sin(ang), jnp.cos(ang)], axis=-1)
        enc = enc.reshape(pos.shape[0], -1)
        return enc if x is None else jnp.concatenate([enc, x], axis=1)


class LearnableFourierInjection(nn.Module):
    """x <- [sin/cos(pos @ W) | x] with learned projection W
    (Li et al. 2021 learnable Fourier features)."""
    num_features: int = 16
    scale: float = 10.0

    @nn.compact
    def __call__(self, pos, x, batch=None, mask=None, train=True):
        w = self.param(
            'freq', nn.initializers.normal(self.scale),
            (pos.shape[1], self.num_features))
        ang = pos @ w
        enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1) \
            / jnp.sqrt(jnp.asarray(self.num_features, pos.dtype))
        return enc if x is None else jnp.concatenate([enc, x], axis=1)


def injection_factory(name):
    return {
        'cat': CatInjection, 'additive': AdditiveInjection,
        'mlp': MLPInjection, 'fourier': FourierInjection,
        'learnable_fourier': LearnableFourierInjection,
    }[name]
