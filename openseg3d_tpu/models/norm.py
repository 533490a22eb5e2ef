"""Mask-aware normalization.

The reference is BatchNorm-heavy (every block: spconv_unet.py:130,
segformer.py:22-31) and BN over ragged point/voxel sets must ignore padded
rows. Statistics are computed with plain jnp sums, so under a data-sharded jit
program XLA turns them into cross-replica psums — i.e. SyncBatchNorm semantics
(the reference's optional --sync_bn, tools/train.py:246-247) fall out for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the valid rows of [..., C] given mask [...].

    torch BatchNorm1d(momentum=m) == here momentum = 1 - m (flax convention:
    new_running = momentum * old + (1-momentum) * batch).
    """
    momentum: float = 0.99
    eps: float = 1e-3
    use_bias: bool = True
    use_scale: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None, train: bool):
        c = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean', lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable('batch_stats', 'var', lambda: jnp.ones(c, jnp.float32))

        if train:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            if mask is not None:
                # ONE pass over x: sum and sum-of-squares reduce together (a
                # sequential mean-then-centered-var needs two full reads of
                # the [N, C] activations per BN, and the model is BN-heavy).
                # var = E[x^2] - E[x]^2 clamped at 0: f32 cancellation on
                # roughly-centered activations is well below eps=1e-3, but
                # tiny negative results would NaN the rsqrt.
                m = mask.astype(jnp.float32)[..., None]
                count = jnp.maximum(jnp.sum(m), 1.0)
                xm = xf * m
                mean = jnp.sum(xm, axis=axes) / count
                ex2 = jnp.sum(xm * xf, axis=axes) / count
                var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
            else:
                mean = jnp.mean(xf, axis=axes)
                var = jnp.var(xf, axis=axes)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        if self.use_scale:
            y = y * self.param('scale', nn.initializers.ones, (c,)).astype(x.dtype)
        if self.use_bias:
            y = y + self.param('bias', nn.initializers.zeros, (c,)).astype(x.dtype)
        if mask is not None:
            y = jnp.where(mask[..., None], y, 0)
        return y


class MaskedLayerNorm(nn.Module):
    """Row-wise LayerNorm; mask only zeroes padded rows."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None):
        y = nn.LayerNorm(epsilon=self.eps)(x)
        if mask is not None:
            y = jnp.where(mask[..., None], y, 0)
        return y
