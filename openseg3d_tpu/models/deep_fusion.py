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

from ..ops.knn import knn_query, voxel_bucket_knn


class DeepFusionBlock(nn.Module):
    image_channel: int
    hidden_channel: int = 32
    n_neighbors: int = 16
    attn_pdrop: float = 0.3
    # candidate-KNN shell (MODEL.FUSION_KNN_*): widen kernel for parity runs
    # where far-range point spacing exceeds the default ±1-voxel shell
    knn_kernel_size: int = 3
    knn_bucket_cap: int = 8

    @nn.compact
    def __call__(self, points_xyz, point_mask, lidar_features, image_features,
                 train: bool, point_voxel_ids=None, voxel_coords=None,
                 spatial_shape=None):
        """points_xyz [B,P,3], lidar_features [B,P,Cl], image_features [B,P,Ci]
        -> [B,P,Ci].

        When voxel structure is supplied, neighbor search runs on the
        voxel-bucket candidate KNN (ops/knn.voxel_bucket_knn — the production
        path; brute force is O(P^2) and unusable at 163k points); without it,
        exact brute-force KNN."""
        dt = lidar_features.dtype
        hc = self.hidden_channel
        q = nn.Dense(hc, dtype=dt)(lidar_features)
        # packed k|v|valid projection: ONE Dense and ONE neighbor gather of
        # (2*hc + 1)-wide rows instead of two hc-wide gathers plus a bool
        # gather — neighbor gathers are row-count-bound (2.6M rows at
        # production caps), so halving the row issues is the win. The validity
        # flag rides as a 0/1 float lane (normal values — bit-level int
        # packing is NOT safe through TPU float paths, see ops/knn.py).
        kv = nn.DenseGeneral(features=(2, hc), dtype=dt,
                             name='kv_proj')(image_features.astype(dt)) \
            .reshape(image_features.shape[:-1] + (2 * hc,))
        img_valid = jnp.sum(jnp.abs(image_features), axis=-1) > 0          # [B,P]
        packed = jnp.concatenate([kv, img_valid[..., None].astype(dt)], axis=-1)

        if point_voxel_ids is not None:
            knn_ids, _ = voxel_bucket_knn(
                self.n_neighbors, points_xyz, point_mask, point_mask,
                point_voxel_ids, voxel_coords, spatial_shape,
                bucket_cap=self.knn_bucket_cap,
                kernel_size=self.knn_kernel_size)
        else:
            knn_ids, _ = knn_query(self.n_neighbors, points_xyz, points_xyz,
                                   point_mask, point_mask)
        safe = jnp.maximum(knn_ids, 0)
        gathered = jnp.take_along_axis(
            packed, safe.reshape(packed.shape[0], -1, 1), axis=1) \
            .reshape(safe.shape + (2 * hc + 1,))
        kn = gathered[..., :hc]
        vn = gathered[..., hc:2 * hc]
        attn = jnp.einsum('bpc,bpkc->bpk', q, kn) / jnp.sqrt(float(hc))

        nb_valid = (gathered[..., 2 * hc] > 0.5) & (knn_ids >= 0)
        # Finite mask value, NOT -inf: an all-invalid row would make softmax
        # emit NaN, and the softmax VJP evaluated at NaN outputs propagates
        # NaN into the q/k grads even under a ZERO incoming cotangent (the
        # where/softmax grad trap) — every padded point row is all-invalid,
        # so training with -inf masking NaNs the whole gradient. With a large
        # negative logit the row softmaxes to uniform (finite fwd + bwd) and
        # is then zeroed explicitly.
        attn = jnp.where(nb_valid, attn, jnp.asarray(-1e9, attn.dtype))
        attn = jax.nn.softmax(attn, axis=-1)
        attn = jnp.where(jnp.any(nb_valid, axis=-1, keepdims=True), attn, 0)
        attn = nn.Dropout(self.attn_pdrop, deterministic=not train)(attn)

        out = jnp.einsum('bpk,bpkc->bpc', attn, vn)
        out = nn.Dense(self.image_channel, dtype=dt)(out)
        return jnp.where(point_mask[..., None], out, 0)
