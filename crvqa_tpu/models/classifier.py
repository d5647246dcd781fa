"""Classifier heads (`hg_transformers/classifier.py`, `fc.py`).

The classifier is the only trainable dense part of the model during stage-2
mask training (besides the mask scores and debias-loss params).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import WeightNormDense


class SimpleClassifier(nn.Module):
    """weight-norm Linear -> ReLU -> Dropout -> weight-norm Linear
    (`SimpleClassifier`, classifier.py:5-22, norm='weight', act='ReLU').

    Submodule names `main_0` / `main_3` mirror the torch `nn.Sequential`
    indices (`classifier.main.0`, `classifier.main.3`) for checkpoint interop.
    """

    hid_dim: int
    out_dim: int
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = WeightNormDense(self.hid_dim, dtype=self.dtype, name="main_0")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return WeightNormDense(self.out_dim, dtype=self.dtype, name="main_3")(h)


class FCNet(nn.Module):
    """`fc.py:FCNet` — stacked weight-norm Linear + act + dropout."""

    dims: tuple[int, ...]
    dropout: float = 0.0
    act: str = "ReLU"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        acts = {"ReLU": nn.relu, "Sigmoid": nn.sigmoid, "Tanh": jnp.tanh}
        fn = acts[self.act]
        for i, d in enumerate(self.dims[1:]):
            x = WeightNormDense(d, dtype=self.dtype, name=f"main_{3 * i}")(x)
            x = fn(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class GTH(nn.Module):
    """`fc.py:GTH` gated-tanh unit."""

    in_dim: int
    out_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        proj = FCNet((self.in_dim, self.out_dim), self.dropout, "Tanh",
                     self.dtype, name="nonlinear")(x, deterministic)
        gate = FCNet((self.in_dim, self.out_dim), self.dropout, "Sigmoid",
                     self.dtype, name="gate")(x, deterministic)
        return proj * gate
