"""Custom layers (↔ ``z/renormalization.py`` and ``z/relu_activation.py``).

- :class:`BatchRenorm` — Batch Renormalization (Ioffe 2017): batch norm with
  per-batch (r, d) corrections toward the running statistics, clipped to
  [1/rmax, rmax] and [−dmax, dmax], so train and inference statistics agree
  on small/correlated batches. The reference ports the same paper to Keras.
- :func:`birelu` — the reference's BiReLU activation (``relu_activation.py``):
  sign-preserving rectification y = relu(x) − relu(−x) with a leak slope.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchRenorm(nn.Module):
    """Batch Renormalization over the last axis."""

    rmax: float = 3.0
    dmax: float = 5.0
    momentum: float = 0.99
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, *, train: bool):
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        gamma = self.param("gamma", nn.initializers.ones, (feat,))
        beta = self.param("beta", nn.initializers.zeros, (feat,))

        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            sigma = jnp.sqrt(var + self.epsilon)
            ra_sigma = jnp.sqrt(ra_var.value + self.epsilon)
            r = jax.lax.stop_gradient(
                jnp.clip(sigma / ra_sigma, 1.0 / self.rmax, self.rmax)
            )
            d = jax.lax.stop_gradient(
                jnp.clip((mean - ra_mean.value) / ra_sigma, -self.dmax, self.dmax)
            )
            xhat = (x - mean) / sigma * r + d
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            xhat = (x - ra_mean.value) / jnp.sqrt(ra_var.value + self.epsilon)
        return gamma * xhat + beta


def birelu(x, leak: float = 0.01):
    """Sign-preserving rectification: positive and negative parts both pass,
    small values are attenuated by ``leak``."""
    pos = jnp.maximum(x, 0.0)
    neg = jnp.minimum(x, 0.0)
    return pos + leak * neg
