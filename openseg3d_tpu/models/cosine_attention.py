"""Cosine-similarity multi-head attention (Swin-v2 style).

Parity: CosineMultiheadAttention (seg3d/models/layers/cosine_msa.py:413-501,
_scaled_cosine_attention :115-177): attention logits are the cosine similarity
of L2-normalized q and k divided by a learnable per-head temperature tau
clamped at tau_min. Operates on windowed tensors [B, W, T, C] with a boolean
key-padding mask; fully padded rows get a uniform (unused) distribution rather
than NaNs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _l2norm(x, eps: float = 1e-12):
    # rsqrt(sum^2 + eps) instead of x/|x|: |x| has a NaN gradient at x == 0,
    # which padded (all-zero) window slots would hit.
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + eps)


class CosineMultiheadAttention(nn.Module):
    d_model: int
    nhead: int
    attn_drop: float = 0.1
    tau_min: float = 0.01
    cosine: bool = True

    @nn.compact
    def __call__(self, q_in, k_in, v_in, key_padding_mask, train: bool):
        """q_in/k_in/v_in [B, W, T, C]; key_padding_mask [B, W, T] (True =
        PADDED, like torch). Returns [B, W, T, C]."""
        c, h = self.d_model, self.nhead
        hd = c // h
        # torch MHA packs q,k,v into one in_proj (cosine_msa.py:446-470)
        qkv = nn.DenseGeneral((3, c), axis=-1, name='in_proj',
                              kernel_init=nn.initializers.xavier_uniform())
        q = qkv(q_in)[..., 0, :]
        k = qkv(k_in)[..., 1, :]
        v = qkv(v_in)[..., 2, :]

        def split(x):
            return x.reshape(x.shape[:-1] + (h, hd))

        q, k, v = split(q), split(k), split(v)

        if self.cosine:
            q = _l2norm(q.astype(jnp.float32))
            k = _l2norm(k.astype(jnp.float32))
            tau = self.param('tau', nn.initializers.constant(0.1), (h,))
            scale = 1.0 / jnp.maximum(tau, self.tau_min)
            logits = jnp.einsum('bwthd,bwshd->bwhts', q, k) * scale[:, None, None]
        else:
            logits = jnp.einsum('bwthd,bwshd->bwhts', q, k) / jnp.sqrt(float(hd))

        mask = key_padding_mask[:, :, None, None, :]           # [B,W,1,1,T]
        logits = jnp.where(mask, -1e9, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum('bwhts,bwshd->bwthd', attn.astype(v.dtype), v)
        out = out.reshape(out.shape[:-2] + (c,))
        out = nn.Dense(c, name='out_proj')(out)
        return out
