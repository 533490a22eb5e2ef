"""Fused window attention (Pallas TPU kernel).

Replaces the XLA einsum path of cosine window attention
(reference: seg3d/models/layers/cosine_msa.py:115-177) for the padded
per-level window buffers [N, T, C] produced by ops/window.py.

Why a kernel: the einsum path materializes per-level logits tensors
[N, heads, T, T] in HBM (~2GB per encoder layer at stage-1 capacities,
measured ~10ms/layer on v5e — pure HBM bandwidth). Here each grid step keeps
its [G*T, T] logit tiles in VMEM, so HBM traffic collapses to the q/k/v/out
streams (~100x less).

Design notes (see /opt/skills/guides/pallas_guide.md):
  * heads are NOT sliced out of the lane (C) dimension — head_dim is 6..48,
    and sub-128 lane slicing is Mosaic-hostile. Instead each head h uses a
    compile-time 0/1 lane mask m_h over C: masking q zeroes the cross-head
    terms of the contraction, so dot(q*m_h, k^T) == per-head logits, and the
    attn @ v product is lane-masked the same way and accumulated. This costs
    H x the MXU FLOPs of sliced heads, but FLOPs here are ~1000x below the
    bandwidth cost the kernel removes.
  * cosine normalization and the 1/tau scale are folded into q/k by the
    caller (plain elementwise XLA ops on the small [N,T,C] buffers).
  * key-padding enters as an additive bias row [N, T] (0 or -1e9) that the
    window partition precomputes once per stage; fully-padded windows produce
    a uniform softmax over zero values -> zero output, which the downstream
    window_to_flat gather discards anyway.
  * G = max(1, 512 // T) windows are processed per grid step so small-T
    levels amortize DMA/launch overhead; N must be padded to a multiple of G
    (ops/window.make_level_specs rounds capacities accordingly).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


GROUP_ALIGN = 64   # level window capacities are rounded to this; every
                   # possible group size divides it


def attention_group(max_tokens: int, channels: int = 0,
                    itemsize: int = 4) -> int:
    """Windows per grid step. Targets more query rows for narrow channels
    (per-grid-step overhead ~3-4us dominates small blocks) and fewer for wide
    ones so the (G,T,C) VMEM blocks + [R,R] f32 logit temporaries stay inside
    the ~16MB scoped VMEM with double-buffered in/out blocks."""
    cb = channels * itemsize
    r_target = 1024 if cb <= 256 else (512 if cb <= 1024 else 256)
    g = max(1, r_target // max_tokens)
    while GROUP_ALIGN % g:
        g -= 1
    return g


def _query_chunk(t: int, c: int, itemsize: int) -> int:
    """Rows per q/out block when a single window is too big for VMEM: the
    largest divisor of t (multiple of 8) with qc*c*itemsize <= ~300KB."""
    if t * c * itemsize <= 300_000:
        return t
    best = 8
    for qc in range(8, t, 8):
        if t % qc == 0 and qc * c * itemsize <= 300_000:
            best = qc
    return best


def _kernel_packed(q_ref, kv_ref, bias_ref, out_ref, *, nhead: int):
    """Packed variant: q_ref/kv_ref are (possibly row-chunked / whole-window)
    blocks of the SAME [N, T, 3C] array; lane blocking below 128 is not
    allowed, so q/k/v are static lane slices taken in-kernel."""
    gq, tq, c3 = q_ref.shape
    g, t, _ = kv_ref.shape
    c = c3 // 3
    r, rk = gq * tq, g * t
    hd = c // nhead
    p_q = q_ref[:].reshape(r, c3)
    p_kv = kv_ref[:].reshape(rk, c3)
    q = p_q[:, :c]
    k = p_kv[:, c:2 * c]
    v = p_kv[:, 2 * c:]
    i = pl.program_id(0)
    bias = bias_ref[pl.ds(i, 1), :].astype(jnp.float32)
    if g > 1:
        same_win = (jax.lax.broadcasted_iota(jnp.int32, (r, rk), 0) // t ==
                    jax.lax.broadcasted_iota(jnp.int32, (r, rk), 1) // t)
        bias = jnp.where(same_win, bias, -1e9)

    dn_qk = (((1,), (1,)), ((), ()))
    dn_av = (((1,), (0,)), ((), ()))
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1) // hd
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    out = jnp.zeros((r, c), jnp.float32)
    for h in range(nhead):
        mask = (lane_head == h).astype(q.dtype)
        logits = jax.lax.dot_general(q * mask, k, dn_qk, precision=prec,
                                     preferred_element_type=jnp.float32)
        logits = logits + bias
        attn = jax.nn.softmax(logits, axis=-1)
        oh = jax.lax.dot_general(attn.astype(v.dtype), v, dn_av, precision=prec,
                                 preferred_element_type=jnp.float32)
        out = out + oh * mask.astype(jnp.float32)
    out_ref[:] = out.reshape(gq, tq, c).astype(out_ref.dtype)


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, nhead: int):
    """One grid step: the q block's G windows (or one window's query-row
    chunk), flattened to R rows, attend to the k/v block's G whole windows.
    All matmuls are plain 2D (Mosaic's batched dot_general crashes the TPU
    compiler here); cross-window attention inside a multi-window row block is
    cut by a block-diagonal -1e9 term fused into the key bias."""
    gq, tq, c = q_ref.shape
    g, t, _ = k_ref.shape
    r, rk = gq * tq, g * t
    hd = c // nhead
    q = q_ref[:].reshape(r, c)
    k = k_ref[:].reshape(rk, c)
    v = v_ref[:].reshape(rk, c)
    i = pl.program_id(0)
    bias = bias_ref[pl.ds(i, 1), :].astype(jnp.float32)       # [1, RK]
    if g > 1:
        same_win = (jax.lax.broadcasted_iota(jnp.int32, (r, rk), 0) // t ==
                    jax.lax.broadcasted_iota(jnp.int32, (r, rk), 1) // t)
        bias = jnp.where(same_win, bias, -1e9)                # [R, RK]

    dn_qk = (((1,), (1,)), ((), ()))                          # q [R,C] @ k^T
    dn_av = (((1,), (0,)), ((), ()))                          # attn @ v [RK,C]
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1) // hd
    out = jnp.zeros((r, c), jnp.float32)
    # precision pinned per dtype: bf16 x bf16 -> f32 is the native MXU mode
    # (a global jax_default_matmul_precision='highest' would request an fp32
    # contract on bf16 operands, which Mosaic rejects — "Bad lhs type"); f32
    # operands keep full-precision contracts.
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    for h in range(nhead):
        mask = (lane_head == h).astype(q.dtype)
        logits = jax.lax.dot_general(q * mask, k, dn_qk, precision=prec,
                                     preferred_element_type=jnp.float32)
        logits = logits + bias
        attn = jax.nn.softmax(logits, axis=-1)
        oh = jax.lax.dot_general(attn.astype(v.dtype), v, dn_av, precision=prec,
                                 preferred_element_type=jnp.float32)
        out = out + oh * mask.astype(jnp.float32)
    out_ref[:] = out.reshape(gq, tq, c).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('nhead', 'interpret'))
def fused_window_attention(q, k, v, bias, nhead: int, interpret: bool = False):
    """q, k, v: [N, T, C] (cosine-normalized, tau-scaled q); bias: [N, T]
    additive key bias (0 valid / -1e9 padded). Returns [N, T, C] in q.dtype.

    N must be a multiple of attention_group(T).
    """
    n, t, c = q.shape
    g = attention_group(t, c, q.dtype.itemsize)
    assert n % g == 0, (n, g)
    assert t % 16 == 0, f'window max_tokens must be a multiple of 16, got {t}'
    # bias rows pre-reshaped to one [1, G*T] lane row per window group: the
    # kernel needs no cross-lane reshape, and the whole array stays in VMEM
    # (4 bytes per token slot)
    bias_rows = bias.reshape(n // g, g * t)

    qc = _query_chunk(t, c, q.dtype.itemsize)
    if g == 1 and qc < t:
        # big single-window levels (e.g. T=800): chunk query rows on a second
        # grid dim so the q/out blocks and [qc, T] logit temporaries fit VMEM;
        # the k/v blocks are index-invariant in the chunk dim (fetched once
        # per window)
        grid = (n, t // qc)
        qblk = lambda i, j: (i, j, 0)
        kblk = lambda i, j: (i, 0, 0)
        q_spec = pl.BlockSpec((1, qc, c), qblk, memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec((1, t, c), kblk, memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, qc, c), qblk, memory_space=pltpu.VMEM)
    else:
        grid = (n // g,)
        blk = lambda i: (i, 0, 0)
        q_spec = kv_spec = out_spec = pl.BlockSpec((g, t, c), blk,
                                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, nhead=nhead),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],   # bias: whole array
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, t, c), q.dtype),
        interpret=interpret,
    )(q, k, v, bias_rows)


@functools.partial(jax.jit, static_argnames=('nhead', 'interpret'))
def fused_window_attention_packed(packed, bias, nhead: int,
                                  interpret: bool = False):
    """Same kernel, but q|k|v ride in ONE packed [N, T, 3C] array (lane blocks
    0/1/2). This lets the caller scatter window buffers ONCE per layer instead
    of three times — scatters cost per ROW, not per byte, and dominate the
    XLA side of the attention layer (profiled ~0.9ms per [V]-row scatter)."""
    n, t, c3 = packed.shape
    assert c3 % 3 == 0
    c = c3 // 3
    # effective channel budget 2c: two packed 3C operand blocks roughly double
    # the per-row VMEM footprint of the unpacked form
    g = attention_group(t, 2 * c, packed.dtype.itemsize)
    assert n % g == 0, (n, g)
    assert t % 16 == 0, f'window max_tokens must be a multiple of 16, got {t}'
    bias_rows = bias.reshape(n // g, g * t)

    qc = _query_chunk(t, 3 * c, packed.dtype.itemsize)
    if g == 1 and qc < t:
        grid = (n, t // qc)
        q_spec = pl.BlockSpec((1, qc, c3), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec((1, t, c3), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, qc, c), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)
    else:
        grid = (n // g,)
        q_spec = pl.BlockSpec((g, t, c3), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        kv_spec = q_spec
        out_spec = pl.BlockSpec((g, t, c), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_packed, nhead=nhead),
        grid=grid,
        in_specs=[q_spec, kv_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, t, c), packed.dtype),
        interpret=interpret,
    )(packed, packed, bias_rows)


def reference_window_attention(q, k, v, bias, nhead: int):
    """Pure-XLA oracle with identical semantics (used by tests and as the
    non-TPU fallback)."""
    n, t, c = q.shape
    hd = c // nhead
    qh = q.reshape(n, t, nhead, hd).astype(jnp.float32)
    kh = k.reshape(n, t, nhead, hd).astype(jnp.float32)
    vh = v.reshape(n, t, nhead, hd).astype(jnp.float32)
    logits = jnp.einsum('nthd,nshd->nhts', qh, kh)
    logits = logits + bias.astype(jnp.float32)[:, None, None, :]
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum('nhts,nshd->nthd', attn, vh)
    return out.reshape(n, t, c).astype(q.dtype)
