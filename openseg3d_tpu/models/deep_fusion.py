"""DeepFusion: point-to-image cross attention.

Parity: DeepFusionBlock (seg3d/models/layers/deep_fusion.py:26-45) — each point
(query = fused lidar features) attends to the precomputed 2D-semantic features
of its K nearest neighbor points; neighbors with all-zero image features (no
camera projection) are masked out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.knn import knn_query


class DeepFusionBlock(nn.Module):
    image_channel: int
    hidden_channel: int = 32
    n_neighbors: int = 16
    attn_pdrop: float = 0.3

    @nn.compact
    def __call__(self, points_xyz, point_mask, lidar_features, image_features,
                 train: bool):
        """points_xyz [B,P,3], lidar_features [B,P,Cl], image_features [B,P,Ci]
        -> [B,P,Ci]."""
        dt = lidar_features.dtype
        q = nn.Dense(self.hidden_channel, dtype=dt)(lidar_features)
        k = nn.Dense(self.hidden_channel, dtype=dt)(image_features.astype(dt))
        v = nn.Dense(self.hidden_channel, dtype=dt)(image_features.astype(dt))

        knn_ids, _ = knn_query(self.n_neighbors, points_xyz, points_xyz,
                               point_mask, point_mask)
        safe = jnp.maximum(knn_ids, 0)
        kn = jnp.take_along_axis(k, safe.reshape(k.shape[0], -1, 1), axis=1) \
            .reshape(safe.shape + (self.hidden_channel,))
        attn = jnp.einsum('bpc,bpkc->bpk', q, kn) / jnp.sqrt(float(self.hidden_channel))

        img_valid = jnp.sum(jnp.abs(image_features), axis=-1) > 0          # [B,P]
        nb_valid = jnp.take_along_axis(img_valid, safe.reshape(k.shape[0], -1), axis=1) \
            .reshape(safe.shape) & (knn_ids >= 0)
        attn = jnp.where(nb_valid, attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = jnp.nan_to_num(attn)                     # all-invalid rows -> 0
        attn = nn.Dropout(self.attn_pdrop, deterministic=not train)(attn)

        vn = jnp.take_along_axis(v, safe.reshape(v.shape[0], -1, 1), axis=1) \
            .reshape(safe.shape + (self.hidden_channel,))
        out = jnp.einsum('bpk,bpkc->bpc', attn, vn)
        out = nn.Dense(self.image_channel, dtype=dt)(out)
        return jnp.where(point_mask[..., None], out, 0)
