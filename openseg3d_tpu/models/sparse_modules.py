"""Sparse conv building blocks shared by both backbones.

Parity: SparseBasicBlock / UpBlock / ConvModule, duplicated in the reference
between spconv_unet.py:12-112 and pointtransformer.py:13-112 — unified here.
Every module takes precomputed rulebooks (the indice_key analog): structure is
built once per stage in the backbone and reused by every conv at that stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sparse_conv import Rulebook, apply_sparse_conv, apply_subm
from .layers import FlattenSELayer, SALayer
from .norm import MaskedBatchNorm

# reference backbone norm: BatchNorm1d(eps=1e-3, momentum=0.01) ->
# flax momentum 0.99 (spconv_unet.py:130)
BN = dict(momentum=0.99, eps=1e-3)


class SparseConv(nn.Module):
    """Bare sparse conv (any rulebook: subm / downsample / inverse)."""
    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, rulebook, out_mask):
        k3 = getattr(rulebook, 'in_idx', None)
        k3 = k3.shape[1] if k3 is not None else 27
        w = self.param('kernel', nn.initializers.kaiming_normal(),
                       (k3, x.shape[-1], self.features))
        if isinstance(rulebook, Rulebook):
            # checkpoint the gather-GEMM: without it every conv's backward
            # keeps its [B, K, Vo, Cin] gathered-neighbor tensor alive in HBM
            # (the round-1 20.3G train OOM at Waymo caps); recomputing the
            # gather in the backward trades one extra row-gather for ~GBs
            y = jax.checkpoint(
                lambda xx, ww: apply_subm(xx, rulebook, ww, out_mask,
                                          compute_dtype=xx.dtype))(x, w)
        else:
            # planar / strided / inverse convs carry custom VJPs whose
            # residuals are just the conv INPUTS — nothing big is saved, so
            # remat would only add a recomputed gather pass to the backward
            y = apply_subm(x, rulebook, w, out_mask, compute_dtype=x.dtype)
        if self.use_bias:
            b = self.param('bias', nn.initializers.zeros, (self.features,))
            y = jnp.where(out_mask[..., None], y + b.astype(y.dtype), 0)
        return y


class ConvModule(nn.Module):
    """conv + BN + ReLU (seg3d/utils/spconv_utils.py:13-32)."""
    features: int

    @nn.compact
    def __call__(self, x, rulebook: Rulebook, out_mask, train: bool):
        y = SparseConv(self.features)(x, rulebook, out_mask)
        y = MaskedBatchNorm(**BN)(y, out_mask, train)
        return nn.relu(y)


class SparseBasicBlock(nn.Module):
    """conv-BN-ReLU-conv-BN [+SE] [+SA] + residual + ReLU
    (spconv_unet.py:12-65). Reference convs carry bias=True (the
    `bias = norm_fn is not None` quirk, spconv_unet.py:24)."""
    planes: int
    with_se: bool = False
    with_sa: bool = False

    @nn.compact
    def __call__(self, x, rulebook: Rulebook, mask, train: bool):
        identity = x
        out = SparseConv(self.planes, use_bias=True)(x, rulebook, mask)
        out = MaskedBatchNorm(**BN)(out, mask, train)
        out = nn.relu(out)
        out = SparseConv(self.planes, use_bias=True)(out, rulebook, mask)
        out = MaskedBatchNorm(**BN)(out, mask, train)
        if self.with_se:
            out = FlattenSELayer()(out, mask)
        if self.with_sa:
            out = SALayer()(out, rulebook, mask)
        out = nn.relu(out + identity)
        return jnp.where(mask[..., None], out, 0)


class UpBlock(nn.Module):
    """Decoder block (spconv_unet.py:68-112): transform the lateral, concat
    with the bottom, bottleneck + channel-fold residual, then upsample (inverse
    conv) or stay (subm) — `out_rulebook`/`out_mask` select which."""
    inplanes: int
    planes: int

    @nn.compact
    def __call__(self, x_bottom, x_lateral, rulebook: Rulebook, mask,
                 out_rulebook: Rulebook, out_mask, train: bool):
        x_trans = SparseBasicBlock(self.inplanes)(x_lateral, rulebook, mask, train)
        x = jnp.concatenate([x_bottom, x_trans], axis=-1)
        x_m = ConvModule(self.inplanes)(x, rulebook, mask, train)
        # channel_reduction: fold 2*inplanes -> inplanes by summing pairs
        # (spconv_unet.py:87-102)
        n, v, c2 = x.shape
        x_red = x.reshape(n, v, self.inplanes, c2 // self.inplanes).sum(axis=-1)
        x = x_m + x_red
        return ConvModule(self.planes)(x, out_rulebook, out_mask, train)
