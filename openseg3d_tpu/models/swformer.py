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

from ..ops.window import (WindowPartition, positional_embedding,
                          permute_rows)
from ..ops.attention import (fused_window_attention_packed,
                             window_attention_packed_train)


def level_offsets(levels):
    """Row offsets of each level's [W_l*T_l] slot range in the combined
    all-levels window buffer."""
    offs = [0]
    for sp in levels:
        offs.append(offs[-1] + sp.num_windows * sp.max_tokens)
    return tuple(offs)


def combined_scatter_index(sp, levels):
    """Per-voxel slot into the combined buffer (-1 = dropped): each voxel
    belongs to exactly one level per shift, so the per-level scatter indices
    merge into ONE index array -> ONE row-scatter per attention layer instead
    of one per (level, tensor)."""
    offs = level_offsets(levels)
    comb = jnp.full_like(sp.scatter_idx[0], -1)
    for li in range(len(levels)):
        idx = sp.scatter_idx[li]
        comb = jnp.where(idx >= 0, idx + offs[li], comb)
    return comb


def _head_l2norm(x, nhead: int, eps: float = 1e-12):
    """Per-head L2 normalization on flat [..., C] features. rsqrt(sum^2+eps)
    instead of x/|x|: |x| has a NaN gradient at x == 0 (padded rows)."""
    shp = x.shape
    xh = x.reshape(shp[:-1] + (nhead, shp[-1] // nhead)).astype(jnp.float32)
    xh = xh * jax.lax.rsqrt(jnp.sum(jnp.square(xh), -1, keepdims=True) + eps)
    return xh.reshape(shp)


class WindowAttention(nn.Module):
    """Cosine window MHA (CosineMultiheadAttention parity,
    cosine_msa.py:413-501, _scaled_cosine_attention :115-177).

    TPU-native data flow: the packed in_proj, per-head cosine normalization,
    and the 1/tau scale all run on the FLAT [B, V, C] features (one pass per
    layer instead of one per padded level buffer); only the normalized q/k/v
    are scattered into the per-level [B, W, T, C] window buffers. In eval the
    per-level attention core is a Pallas kernel that keeps its logits in VMEM
    (ops/attention.py); in training it is an einsum with attention dropout
    (the reference's attn_drop), recomputed under remat.
    """
    d_model: int
    nhead: int
    levels: tuple            # static tuple[LevelSpec]
    shift: int
    attn_drop: float = 0.1
    tau_min: float = 0.01

    def _level_fits(self, spec, itemsize: int, train: bool) -> bool:
        """Whether a level's kernel blocks fit scoped VMEM. The backward
        recomputation holds ~6 live f32 logit-shaped temporaries plus the
        dpacked output block; logit temporaries are chunk-sized ([rch, rch]
        window-local chunks for grouped levels, [qc, T] query-row chunks for
        single-window levels), mirroring ops/attention's kernels."""
        t, c = spec.max_tokens, self.d_model
        if not train:
            return t * c * itemsize <= 1_100_000
        from ..ops.attention import _train_group, _window_chunk, _row_chunk
        g = _train_group(t, c, itemsize)
        blocks = 2 * (7 * g * t * c * itemsize)          # packed+g+dpacked, 2x buffered
        if g > 1:
            rch = _window_chunk(g, t) * t
            temps = 6 * (rch * rch * 4) + 3 * (rch * c * 4)
        else:
            qc = _row_chunk(t, t, 3 * c, itemsize)
            temps = 6 * (qc * t * 4) + 3 * (t * c * 4)
        return blocks + temps <= 12_000_000

    @nn.compact
    def __call__(self, feat, windowed, part: WindowPartition, train: bool):
        """feat [B, V, C]; windowed = (pos [B,V,C] flat, per-level biases
        [B,W,T], combined scatter index [B,V], slot->voxel inverse index
        [B,S]) precomputed once per block (layer-invariant)."""
        pos, biases = windowed[0], windowed[1]
        c, h = self.d_model, self.nhead
        b, v, _ = feat.shape

        # torch MHA packs q,k,v into one in_proj (cosine_msa.py:446-470);
        # q and k project feat+pos, v projects feat (:233-258). Because the
        # projection is affine, slicing the packed kernel lets each input be
        # multiplied exactly once (the round-1 form ran the full 3C Dense on
        # both inputs and discarded 2/3 of each result).
        wp = self.param('in_proj_kernel', nn.initializers.xavier_uniform(),
                        (c, 3 * c))
        bp = self.param('in_proj_bias', nn.initializers.zeros, (3 * c,))
        wd, bd = wp.astype(feat.dtype), bp.astype(feat.dtype)
        qk_in = (feat + pos) @ wd[:, :2 * c] + bd[:2 * c]
        q, k = qk_in[..., :c], qk_in[..., c:]
        val = feat @ wd[:, 2 * c:] + bd[2 * c:]

        tau = self.param('tau', nn.initializers.constant(0.1), (h,))
        scale = 1.0 / jnp.maximum(tau, self.tau_min)          # [h]
        scale_c = jnp.repeat(scale, c // h)                   # [C]
        q = (_head_l2norm(q, h) * scale_c).astype(feat.dtype)
        k = _head_l2norm(k, h).astype(feat.dtype)

        on_tpu = jax.default_backend() == 'tpu'
        # ONE row-GATHER of the packed q|k|v into the combined all-levels
        # buffer (via the layer-invariant slot->voxel inverse index built once
        # per block), one attention core per level on its static row range,
        # ONE gather back. Row-gathers run ~4x faster than the equivalent
        # row-scatter on v5e (profiled 3.8ms scatter vs ~0.9ms gather for the
        # stage-1 [S, 3C] buffer), and the per-(level,tensor) form was 16 row
        # ops per layer. Used by both the kernel and einsum cores, train+eval.
        comb = windowed[2]                                    # [B, V]
        inv_idx = windowed[3]                                 # [B, S] slot->voxel
        offs = level_offsets(self.levels)
        pack = jnp.concatenate([q, k, val], axis=-1)          # [B, V, 3C]
        big = permute_rows(pack, inv_idx, comb)               # [B, S, 3C]
        # named so the remat policy can SAVE the windowed q|k|v buffer: it is
        # both the most expensive recompute in the layer body (an [S, 3C]
        # row-gather) and the residual of the attention kernel's custom VJP,
        # so saving it lets the backward skip the in_proj/l2norm/permute chain
        from jax.ad_checkpoint import checkpoint_name
        big = checkpoint_name(big, 'attn_pack')
        if train:
            # per-level int32 seeds for the in-kernel attention dropout
            seeds = jax.random.randint(self.make_rng('dropout'),
                                       (len(self.levels),), 0, 2 ** 31 - 1)
        outs = []
        for li, spec in enumerate(self.levels):
            w, t = spec.num_windows, spec.max_tokens
            seg = big[:, offs[li]:offs[li + 1]].reshape(b * w, t, 3 * c)
            bias2 = biases[li].reshape(b * w, t)
            # true packed window count per sample: kernel grid blocks past it
            # are all padding and skip compute (capacity W is sized for the
            # worst case; typical frames fill a fraction of it)
            nw = jnp.minimum(part.shifts[self.shift].num_windows[:, li],
                             w).astype(jnp.int32)
            if on_tpu and self._level_fits(spec, pack.dtype.itemsize, train):
                if train:
                    o3 = window_attention_packed_train(
                        seg, bias2, seeds[li:li + 1], nw, h,
                        float(self.attn_drop))
                else:
                    o3 = fused_window_attention_packed(seg, bias2, nhead=h,
                                                       nw=nw)
            else:
                # einsum core on the same windowed segment (non-TPU backends
                # and levels whose backward would overflow VMEM)
                hd = c // h
                qh = seg[..., :c].reshape(b * w, t, h, hd).astype(jnp.float32)
                kh = seg[..., c:2 * c].reshape(b * w, t, h, hd).astype(jnp.float32)
                vh = seg[..., 2 * c:].reshape(b * w, t, h, hd).astype(jnp.float32)
                logits = jnp.einsum('nthd,nshd->nhts', qh, kh)
                logits = logits + bias2.astype(jnp.float32)[:, None, None, :]
                attn = jax.nn.softmax(logits, axis=-1)
                attn = nn.Dropout(self.attn_drop,
                                  deterministic=not train)(attn)
                o3 = jnp.einsum('nhts,nshd->nthd', attn, vh
                                ).reshape(b * w, t, c).astype(pack.dtype)
            outs.append(o3.reshape(b, w * t, c))
        cat = jnp.concatenate(outs, axis=1)                   # [B, total, C]
        # named so the SWFormerBlock remat policy can SAVE the attention-core
        # outputs: the block's backward then skips re-running the forward
        # attention kernels (1/3 of the attention custom-call time) at the
        # cost of one [B, total, C] bf16 buffer per layer (~12MB)
        from jax.ad_checkpoint import checkpoint_name
        cat = checkpoint_name(cat, 'attn_core')
        out = permute_rows(cat, comb, inv_idx)                # [B, V, C]
        out = nn.Dense(c, name='out_proj', dtype=feat.dtype)(out.astype(feat.dtype))
        return out


class MLP(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.hidden, dtype=x.dtype)(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(self.out, dtype=x.dtype)(x)
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
        feat = feat + _drop_path(nn.LayerNorm(dtype=a.dtype)(a), dp_rate, r1, train)
        m = MLP(self.mlp_hidden, self.d_model, self.drop)(feat, train)
        feat = feat + _drop_path(nn.LayerNorm(dtype=m.dtype)(m), dp_rate, r2, train)
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
    unroll: bool = True

    @nn.compact
    def __call__(self, feat, part: WindowPartition, train: bool):
        # drop everything the dual-shift caps dropped (keep_mask semantics)
        feat = jnp.where(part.keep[..., None], feat, 0)

        # per shift: flat positional embedding; per level: additive key bias
        # (0 valid / -1e9 padded) — computed ONCE per block and broadcast into
        # the layer scan (layer-invariant). All levels' biases come from ONE
        # combined-buffer scatter per shift (scatters cost per row; the
        # previous per-level window_mask form paid 4 [V]-row scatters)
        b = feat.shape[0]
        v = feat.shape[1]
        offs = level_offsets(self.levels)
        windowed = []
        for s in (0, 1):
            pos = positional_embedding(part.shifts[s].coors_in_win,
                                       self.window_shape, self.d_model).astype(feat.dtype)
            comb = combined_scatter_index(part.shifts[s], self.levels)
            tgt = jnp.where(comb >= 0, comb, offs[-1])
            # ONE [V]-row scatter inverts comb into the layer-invariant
            # slot->voxel index (-1 = padding slot); every layer then fills
            # its q|k|v window buffer with a row-gather instead of the ~4x
            # slower row-scatter. The key bias falls out of the same scatter.
            inv_idx = jnp.full((b, offs[-1]), -1, jnp.int32)
            inv_idx = jax.vmap(lambda o, t: o.at[t].set(
                jnp.arange(v, dtype=jnp.int32), mode='drop',
                unique_indices=True))(inv_idx, tgt)
            big = jnp.where(inv_idx >= 0, 0.0, -1e9).astype(jnp.float32)
            biases = tuple(
                big[:, offs[li]:offs[li + 1]].reshape(
                    b, spec.num_windows, spec.max_tokens)
                for li, spec in enumerate(self.levels))
            windowed.append((pos, biases, comb, inv_idx))

        hidden = int(self.d_model * self.mlp_ratio)
        rates = tuple(self.drop_path) if self.drop_path else (0.0,) * self.depth
        half = self.depth // 2

        for shift, (lo, hi) in ((0, (0, half)), (1, (half, self.depth))):
            n = hi - lo
            if n == 0:
                continue
            Scan = nn.scan(
                nn.remat(EncoderLayer, static_argnums=(),
                         policy=jax.checkpoint_policies.save_only_these_names(
                             'attn_core', 'attn_pack')),
                variable_axes={'params': 0},
                split_rngs={'params': True, 'dropout': True},
                in_axes=((nn.broadcast, nn.broadcast, 0),),
                # unroll=True: no loop barriers, larger program. Measured r5
                # on the real chip: False costs +15ms train step (infer
                # unchanged) and saves ~40s/16s fresh compile;
                # RUNTIME.SCAN_UNROLL picks (config.py)
                length=n, unroll=self.unroll)
            dp = jnp.asarray(rates[lo:hi], dtype=feat.dtype)
            feat, _ = Scan(self.d_model, self.nhead, hidden, self.levels,
                           shift, train, self.drop, self.attn_drop,
                           name=f'layers_shift{shift}')(
                feat, (windowed[shift], part, dp))
        return feat
