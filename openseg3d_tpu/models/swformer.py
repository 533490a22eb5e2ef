"""SWFormer window-attention blocks.

Parity: WindowAttention / EncoderLayer / SWFormerBlock
(seg3d/models/layers/point_transformer_layer.py:222-339). Each encoder layer
runs cosine MHA per occupancy bucket on static [B, W_l, T_l, C] tensors
(the flat<->window scatter replaces the reference's dict-of-dynamic-buckets),
followed by the post-norm residual + MLP.

Compile-friendliness: the depth dimension is an nn.scan over a single
rematerialized encoder-layer body (params stacked along axis 0), so XLA
compiles one layer per (stage, shift) instead of one per layer — the remat is
the analog of the reference's torch.utils.checkpoint (:321-334). Per-layer
stochastic-depth rates ride along as a scanned input.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.window import (WindowPartition, flat_to_window, window_to_flat,
                          window_mask, positional_embedding)
from .cosine_attention import CosineMultiheadAttention


class WindowAttention(nn.Module):
    d_model: int
    nhead: int
    levels: tuple            # static tuple[LevelSpec]
    shift: int
    attn_drop: float = 0.1

    @nn.compact
    def __call__(self, feat, windowed, part: WindowPartition, train: bool):
        """feat [B, V, C]; windowed = per-level (pos3 [B,W,T,C], pad3 [B,W,T])
        precomputed once per block (positional embedding and padding mask are
        layer-invariant — hoisting them out of the 18-layer stack saves ~40% of
        the attention data movement). One scatter + one gather per level:
        v = scatter(feat), q = k = v + pos3 (WindowAttention.forward, :233-258)."""
        sp = part.shifts[self.shift]
        attn = CosineMultiheadAttention(self.d_model, self.nhead, self.attn_drop)
        out = jnp.zeros_like(feat)
        for li, spec in enumerate(self.levels):
            idx = sp.scatter_idx[li]
            pos3, pad3 = windowed[li]
            v3 = flat_to_window(feat, idx, spec)
            q3 = v3 + pos3
            o3 = attn(q3, q3, v3, pad3, train)
            out = out + window_to_flat(o3, idx, spec)
        return out


class MLP(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.hidden)(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(self.out)(x)
        return nn.Dropout(self.drop, deterministic=not train)(x)


def _drop_path(x, rate, rng, train: bool):
    """Stochastic depth with a (possibly traced) rate (drop.py:4-34)."""
    if not train:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / jnp.maximum(keep, 1e-6), 0)


class EncoderLayer(nn.Module):
    """Post-norm residual encoder layer (EncoderLayer.forward, :278-298):
    x = x + drop_path(LN(attn(x))); x = x + drop_path(LN(mlp(x)))."""
    d_model: int
    nhead: int
    mlp_hidden: int
    levels: tuple
    shift: int
    train: bool
    drop: float = 0.0
    attn_drop: float = 0.1

    @nn.compact
    def __call__(self, feat, inputs):
        windowed, part, dp_rate = inputs
        train = self.train
        a = WindowAttention(self.d_model, self.nhead, self.levels, self.shift,
                            self.attn_drop)(feat, windowed, part, train)
        if train:
            r1, r2 = jax.random.split(self.make_rng('dropout'))
        else:
            r1 = r2 = None
        feat = feat + _drop_path(nn.LayerNorm()(a), dp_rate, r1, train)
        m = MLP(self.mlp_hidden, self.d_model, self.drop)(feat, train)
        feat = feat + _drop_path(nn.LayerNorm()(m), dp_rate, r2, train)
        return feat, None


class SWFormerBlock(nn.Module):
    """depth/2 layers on shift 0 then depth - depth/2 on shift 1 (SWFormerBlock,
    :314-337); each half is an nn.scan over a rematerialized layer body."""
    d_model: int
    nhead: int
    depth: int
    window_shape: tuple
    levels: tuple
    mlp_ratio: float = 2.0
    attn_drop: float = 0.1
    drop: float = 0.0
    drop_path: tuple = ()

    @nn.compact
    def __call__(self, feat, part: WindowPartition, train: bool):
        # drop everything the dual-shift caps dropped (keep_mask semantics)
        feat = jnp.where(part.keep[..., None], feat, 0)

        # per (shift, level): windowed positional embedding + padding mask,
        # computed ONCE per block and broadcast into the layer scan
        windowed = []
        for s in (0, 1):
            pos = positional_embedding(part.shifts[s].coors_in_win,
                                       self.window_shape, self.d_model).astype(feat.dtype)
            per_level = []
            for li, spec in enumerate(self.levels):
                idx = part.shifts[s].scatter_idx[li]
                pos3 = flat_to_window(pos, idx, spec)
                pad3 = ~window_mask(idx, spec)
                per_level.append((pos3, pad3))
            windowed.append(tuple(per_level))

        hidden = int(self.d_model * self.mlp_ratio)
        rates = tuple(self.drop_path) if self.drop_path else (0.0,) * self.depth
        half = self.depth // 2

        for shift, (lo, hi) in ((0, (0, half)), (1, (half, self.depth))):
            n = hi - lo
            if n == 0:
                continue
            Scan = nn.scan(
                nn.remat(EncoderLayer, static_argnums=()),
                variable_axes={'params': 0},
                split_rngs={'params': True, 'dropout': True},
                in_axes=((nn.broadcast, nn.broadcast, 0),),
                length=n, unroll=True)  # unrolled: while-loop barriers cost
                                        # more than the larger TPU program
            dp = jnp.asarray(rates[lo:hi], dtype=feat.dtype)
            feat, _ = Scan(self.d_model, self.nhead, hidden, self.levels,
                           shift, train, self.drop, self.attn_drop,
                           name=f'layers_shift{shift}')(
                feat, (windowed[shift], part, dp))
        return feat
