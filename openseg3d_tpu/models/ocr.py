"""Object-Contextual Representations at the UNet bottleneck.

Parity with seg3d/models/layers/ocr.py, but the reference's per-batch-item
Python loops (ocr.py:19-34, 108-112) become batched einsums over the padded
[B, V, C] layout — one soft class-region pooling + one pixel<->region attention
for the whole batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sparse_conv import Rulebook, apply_subm
from .norm import MaskedBatchNorm


class _ProjectBNReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, mask, train: bool):
        x = nn.Dense(self.features, use_bias=False, dtype=x.dtype,
                     kernel_init=nn.initializers.kaiming_normal())(x)
        x = MaskedBatchNorm(momentum=0.9, eps=1e-5)(x, mask, train)
        return nn.relu(x)


class OCRLayer(nn.Module):
    """forward(features, aux_logits, rulebook, mask) -> features.

    in_channels -> transform to mid_channels -> class-context attention with
    key_channels -> bottleneck back to in_channels (OCRLayer.forward,
    ocr.py:102-116).
    """
    in_channels: int = 256
    mid_channels: int = 128
    key_channels: int = 64
    scale: float = 1.0
    drop: float = 0.05

    @nn.compact
    def __call__(self, features, probs, rulebook, mask, train: bool):
        # transform_input: subm 3^3 conv + BN + ReLU (ocr.py:88-92)
        k3 = rulebook.in_idx.shape[1] if isinstance(rulebook, Rulebook) else 27
        w = self.param('transform_kernel', nn.initializers.kaiming_normal(),
                       (k3, features.shape[-1], self.mid_channels))
        feats = apply_subm(features, rulebook, w, mask,
                           compute_dtype=features.dtype)
        feats = MaskedBatchNorm(momentum=0.9, eps=1e-5)(feats, mask, train)
        feats = nn.relu(feats)

        # SpatialGatherModule (ocr.py:10-34): soft class-region pooling.
        # softmax over voxels per class, masked to valid rows.
        logits = jnp.where(mask[..., None], self.scale * probs, -1e9)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=1)     # [B, V, K]
        context = jnp.einsum('bvk,bvc->bkc', attn,
                             feats.astype(jnp.float32)).astype(feats.dtype)

        # ObjectAttentionBlock (ocr.py:37-80)
        ones = jnp.ones(context.shape[:2], dtype=bool)
        query = _ProjectBNReLU(self.key_channels)(feats, mask, train)      # [B,V,kc]
        key = _ProjectBNReLU(self.key_channels)(context, ones, train)      # [B,K,kc]
        value = _ProjectBNReLU(self.key_channels)(context, ones, train)    # [B,K,kc]
        sim = jnp.einsum('bvk,bck->bvc', query, key) * (self.key_channels ** -0.5)
        sim = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(feats.dtype)
        ctx = jnp.einsum('bvc,bck->bvk', sim, value)
        ctx = _ProjectBNReLU(self.mid_channels)(ctx, mask, train)          # bottleneck

        out = jnp.concatenate([ctx, feats], axis=-1)
        out = _ProjectBNReLU(self.in_channels)(out, mask, train)
        out = nn.Dropout(self.drop, deterministic=not train)(out)
        return jnp.where(mask[..., None], out, 0)
