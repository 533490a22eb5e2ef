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


def _window_chunk(g: int, t: int, target_rows: int = 128) -> int:
    """Windows per in-kernel compute chunk. Attention is fully window-local,
    so keys can be restricted to the chunk's own rows: logits shrink from the
    block's [G*T, G*T] (only block-diagonal [T, T] tiles meaningful) to
    [CH*T, CH*T] — at G=16/T=64 that is 8x less MXU work and 8x less softmax
    VPU work (the measured bottleneck of the grouped kernel). ~128 rows keeps
    the matmuls MXU-shaped."""
    ch = max(1, target_rows // t)
    ch = min(ch, g)
    while g % ch:
        ch -= 1
    return ch


def _kernel_packed(nw_ref, q_ref, kv_ref, bias_ref, out_ref, *, nhead: int,
                   wps: int, stride: int):
    """Packed variant: q_ref/kv_ref are (possibly row-chunked / whole-window)
    blocks of the SAME [N, T, 3C] array; lane blocking below 128 is not
    allowed, so q/k/v are static lane slices taken in-kernel.

    nw_ref (SMEM, [B]) is the true window count per sample and level: window
    ranks are densely packed from 0 (ops/window._shift_partition cumsum), so a
    chunk whose first window rank >= nw is entirely padding — its v rows
    are all zero and its output would be exactly zero. Skip the matmuls and
    just write zeros (capacity-padded levels typically run 2-4x more blocks
    than real windows); skipping is per CHUNK, so partially-real blocks only
    compute their live prefix."""
    gq, tq, c3 = q_ref.shape
    gk, t, _ = kv_ref.shape
    c = c3 // 3
    i = pl.program_id(0)
    # stride = windows per grid step along dim 0 (g for the grouped path, 1
    # for the query-chunked path whose grid is (n, t//qc))
    win_rank = (i * stride) % wps             # first window of this block
    sample = (i * stride) // wps
    hd = c // nhead
    dn_qk = (((1,), (1,)), ((), ()))
    dn_av = (((1,), (0,)), ((), ()))
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1) // hd
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    if gq != gk or tq != t:
        # single-window query-row-chunked path (big-T levels): queries attend
        # the whole window's keys
        @pl.when(win_rank >= nw_ref[sample])
        def _zero():
            out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

        @pl.when(win_rank < nw_ref[sample])
        def _compute():
            r, rk = gq * tq, gk * t
            q = q_ref[:].reshape(r, c3)[:, :c]
            p_kv = kv_ref[:].reshape(rk, c3)
            k = p_kv[:, c:2 * c]
            v = p_kv[:, 2 * c:]
            bias = bias_ref[pl.ds(i, 1), :].astype(jnp.float32)
            out = jnp.zeros((r, c), jnp.float32)
            for h in range(nhead):
                mask = (lane_head == h).astype(q.dtype)
                logits = jax.lax.dot_general(q * mask, k, dn_qk, precision=prec,
                                             preferred_element_type=jnp.float32)
                attn = jax.nn.softmax(logits + bias, axis=-1)
                oh = jax.lax.dot_general(attn.astype(v.dtype), v, dn_av,
                                         precision=prec,
                                         preferred_element_type=jnp.float32)
                out = out + oh * mask.astype(jnp.float32)
            out_ref[:] = out.reshape(gq, tq, c).astype(out_ref.dtype)
        return

    ch = _window_chunk(gq, t)
    rch = ch * t
    n_chunks = gq // ch

    for s in range(n_chunks):
        @pl.when(win_rank + s * ch >= nw_ref[sample])
        def _zero(s=s):
            out_ref[s * ch:(s + 1) * ch] = jnp.zeros((ch, tq, c), out_ref.dtype)

        @pl.when(win_rank + s * ch < nw_ref[sample])
        def _compute(s=s):
            p = q_ref[s * ch:(s + 1) * ch].reshape(rch, c3)
            q = p[:, :c]
            k = p[:, c:2 * c]
            v = p[:, 2 * c:]
            # bias_rows is reshaped one row PER CHUNK by the caller: the slice
            # sits at lane offset 0 (a chunk-local lane slice of a block-wide
            # row keeps its offset in the layout, and Mosaic then cannot
            # broadcast the [1, rch] vector against [rch, rch] logits)
            bias = bias_ref[pl.ds(i * n_chunks + s, 1), :].astype(jnp.float32)
            if ch > 1:
                same_win = (jax.lax.broadcasted_iota(jnp.int32, (rch, rch), 0) // t ==
                            jax.lax.broadcasted_iota(jnp.int32, (rch, rch), 1) // t)
                bias = jnp.where(same_win, bias, -1e9)
            out = jnp.zeros((rch, c), jnp.float32)
            for h in range(nhead):
                mask = (lane_head == h).astype(q.dtype)
                logits = jax.lax.dot_general(q * mask, k, dn_qk, precision=prec,
                                             preferred_element_type=jnp.float32)
                attn = jax.nn.softmax(logits + bias, axis=-1)
                oh = jax.lax.dot_general(attn.astype(v.dtype), v, dn_av,
                                         precision=prec,
                                         preferred_element_type=jnp.float32)
                out = out + oh * mask.astype(jnp.float32)
            out_ref[s * ch:(s + 1) * ch] = out.reshape(ch, tq, c).astype(out_ref.dtype)


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
                                  interpret: bool = False, nw=None):
    """Same kernel, but q|k|v ride in ONE packed [N, T, 3C] array (lane blocks
    0/1/2). This lets the caller scatter window buffers ONCE per layer instead
    of three times — scatters cost per ROW, not per byte, and dominate the
    XLA side of the attention layer (profiled ~0.9ms per [V]-row scatter).

    nw: optional int32 [B] with B dividing N — true (densely packed) window
    count per sample; N/B is the per-sample window capacity. Blocks past nw
    skip compute and write zeros (their output is exactly zero anyway: padded
    windows hold all-zero v rows)."""
    n, t, c3 = packed.shape
    assert c3 % 3 == 0
    c = c3 // 3
    # effective channel budget 2c: two packed 3C operand blocks roughly double
    # the per-row VMEM footprint of the unpacked form
    g = attention_group(t, 2 * c, packed.dtype.itemsize)
    assert n % g == 0, (n, g)
    assert t % 16 == 0, f'window max_tokens must be a multiple of 16, got {t}'
    # one bias row per compute CHUNK (not per block): every kernel bias slice
    # is then a dynamic whole-row at lane offset 0, which Mosaic can broadcast
    bias_rows = bias.reshape(n // _window_chunk(g, t),
                             _window_chunk(g, t) * t)
    if nw is None:
        nw_arr = jnp.full((1,), n, jnp.int32)     # no skipping
        wps = n
    else:
        nw_arr = jnp.asarray(nw, jnp.int32)
        assert n % nw_arr.shape[0] == 0, (n, nw_arr.shape)
        wps = n // nw_arr.shape[0]

    qc = _query_chunk(t, 3 * c, packed.dtype.itemsize)
    if g == 1 and qc < t:
        grid = (n, t // qc)
        stride = 1
        q_spec = pl.BlockSpec((1, qc, c3), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec((1, t, c3), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, qc, c), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)
    else:
        grid = (n // g,)
        stride = g
        q_spec = pl.BlockSpec((g, t, c3), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        kv_spec = q_spec
        out_spec = pl.BlockSpec((g, t, c), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_packed, nhead=nhead, wps=wps, stride=stride),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), q_spec, kv_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, t, c), packed.dtype),
        interpret=interpret,
    )(nw_arr, packed, packed, bias_rows)


def _train_group(t: int, c: int, itemsize: int) -> int:
    """Window group for the train fwd/bwd kernels: the bwd grid step holds
    packed + g + dpacked blocks (7c rows) plus ~6 live f32 [R, RK] logit
    temporaries, so budget rows more conservatively than the eval kernel."""
    return attention_group(t, 3 * c, itemsize)


def _dropout_mask(shape, drop_rate: float):
    """0/1 keep mask from the seeded in-kernel PRNG. Caller must have run
    pltpu.prng_seed; consecutive calls advance the stream, so fwd and bwd
    regenerate IDENTICAL masks by issuing the same call sequence."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thr = jnp.uint32(min(int(drop_rate * 2 ** 32), 2 ** 32 - 1))
    return (bits >= thr).astype(jnp.float32)


def _row_chunk(r: int, rk: int, c3: int, itemsize: int) -> int:
    """Query rows processed per inner step of the train kernels. The backward
    body keeps ~6 [QC, RK] f32 temporaries live (logits/attn/dropout mask/
    attn_d/dp/ds); at T=800 whole-window chunks that is 6 x 2.56MB and the
    grid step overflows the 16M scoped-VMEM limit (observed 16.58M). Chunks
    are static (unrolled) divisors of r sized so 6 temporaries fit what the
    16M budget leaves after the double-buffered pk/g/out blocks (the bwd
    footprint — fwd uses the same formula so the dropout PRNG streams of the
    two kernels stay aligned)."""
    c = c3 // 3
    block_bytes = 2 * r * (c3 + c + c3) * itemsize   # 2x(pk + g + out) blocks
    budget = 13_500_000 - block_bytes                # ~2.5M headroom of 16M
    limit = max(budget // (6 * 4), 8 * rk)           # >=8 rows always
    if r * rk <= limit:
        return r
    best = 8
    for qc in range(8, r + 1, 8):
        if r % qc == 0 and qc * rk <= limit:
            best = qc
    return best


def _kernel_packed_train(seed_ref, nw_ref, pk_ref, bias_ref, out_ref, *,
                         nhead: int, drop_rate: float, wps: int):
    """Forward train kernel: eval kernel + attention dropout after softmax
    (cosine_msa.py:174 F.dropout on attn weights). Unlike the eval kernel,
    q and k/v share ONE packed operand block, halving the streamed VMEM
    blocks.

    Two chunking modes, mirrored EXACTLY by the backward so both consume the
    dropout PRNG stream identically (per-chunk seeding seed + i*n_chunks + s
    makes the streams independent of which chunks are skipped):
      * g > 1: window-local chunks — keys restricted to the chunk's own
        windows (see _window_chunk), per-chunk padding skip;
      * g == 1 (big-T levels): query-row chunks against the whole window's
        keys — required for VMEM at T=800."""
    g, t, c3 = pk_ref.shape
    c = c3 // 3
    i = pl.program_id(0)
    win_rank = (i * g) % wps
    sample = (i * g) // wps
    hd = c // nhead
    inv_keep = 1.0 / max(1.0 - drop_rate, 1e-6)
    dn_qk = (((1,), (1,)), ((), ()))
    dn_av = (((1,), (0,)), ((), ()))
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1) // hd
    prec = (jax.lax.Precision.HIGHEST if pk_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    if g > 1:
        ch = _window_chunk(g, t)
        rch = ch * t
        n_chunks = g // ch

        for s in range(n_chunks):
            @pl.when(win_rank + s * ch >= nw_ref[sample])
            def _zero(s=s):
                out_ref[s * ch:(s + 1) * ch] = jnp.zeros((ch, t, c),
                                                         out_ref.dtype)

            @pl.when(win_rank + s * ch < nw_ref[sample])
            def _compute(s=s):
                if drop_rate > 0.0:
                    pltpu.prng_seed(seed_ref[0] + i * n_chunks + s)
                p = pk_ref[s * ch:(s + 1) * ch].reshape(rch, c3)
                q = p[:, :c]
                k = p[:, c:2 * c]
                v = p[:, 2 * c:]
                # one bias row per chunk (lane offset 0 — see _kernel_packed)
                bias = bias_ref[pl.ds(i * n_chunks + s, 1),
                                :].astype(jnp.float32)
                if ch > 1:
                    same_win = (jax.lax.broadcasted_iota(jnp.int32, (rch, rch), 0) // t ==
                                jax.lax.broadcasted_iota(jnp.int32, (rch, rch), 1) // t)
                    bias = jnp.where(same_win, bias, -1e9)
                out = jnp.zeros((rch, c), jnp.float32)
                for h in range(nhead):
                    mask = (lane_head == h).astype(q.dtype)
                    logits = jax.lax.dot_general(q * mask, k, dn_qk,
                                                 precision=prec,
                                                 preferred_element_type=jnp.float32)
                    attn = jax.nn.softmax(logits + bias, axis=-1)
                    if drop_rate > 0.0:
                        attn = attn * (_dropout_mask((rch, rch), drop_rate)
                                       * inv_keep)
                    oh = jax.lax.dot_general(attn.astype(v.dtype), v, dn_av,
                                             precision=prec,
                                             preferred_element_type=jnp.float32)
                    out = out + oh * mask.astype(jnp.float32)
                out_ref[s * ch:(s + 1) * ch] = out.reshape(ch, t, c).astype(
                    out_ref.dtype)
        return

    @pl.when(win_rank >= nw_ref[sample])
    def _zero():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(win_rank < nw_ref[sample])
    def _compute():
        r = rk = g * t
        if drop_rate > 0.0:
            pltpu.prng_seed(seed_ref[0] + i)
        p_all = pk_ref[:].reshape(r, c3)
        q = p_all[:, :c]
        k = p_all[:, c:2 * c]
        v = p_all[:, 2 * c:]
        bias = bias_ref[pl.ds(i, 1), :].astype(jnp.float32)
        qc = _row_chunk(r, rk, c3, jnp.dtype(pk_ref.dtype).itemsize)
        out_rows = []
        for s in range(0, r, qc):
            qs = q[s:s + qc]
            out_s = jnp.zeros((qc, c), jnp.float32)
            for h in range(nhead):
                mask = (lane_head == h).astype(q.dtype)
                logits = jax.lax.dot_general(qs * mask, k, dn_qk,
                                             precision=prec,
                                             preferred_element_type=jnp.float32)
                attn = jax.nn.softmax(logits + bias, axis=-1)
                if drop_rate > 0.0:
                    attn = attn * (_dropout_mask((qc, rk), drop_rate) * inv_keep)
                oh = jax.lax.dot_general(attn.astype(v.dtype), v, dn_av,
                                         precision=prec,
                                         preferred_element_type=jnp.float32)
                out_s = out_s + oh * mask.astype(jnp.float32)
            out_rows.append(out_s)
        out = (out_rows[0] if len(out_rows) == 1
               else jnp.concatenate(out_rows, 0))
        out_ref[:] = out.reshape(g, t, c).astype(out_ref.dtype)


def _kernel_packed_bwd(seed_ref, nw_ref, pk_ref, bias_ref, g_ref, dout_ref, *,
                       nhead: int, drop_rate: float, wps: int):
    """Backward: recompute attn per head in VMEM (flash-style — nothing but
    q/k/v/g ever touches HBM), regenerate the dropout mask from the same
    seed/stream, and emit dq|dk|dv packed on the lane axis. Skips the same
    all-padding chunks as the forward (their dq/dk/dv are exactly zero: the
    cotangent rows entering padded windows are zero). Chunking mirrors
    _kernel_packed_train exactly: window-local chunks for g > 1 (keys are
    chunk-local, so dk/dv need no cross-chunk accumulation), query-row
    chunks against full keys for g == 1."""
    gw, t, c3 = pk_ref.shape
    c = c3 // 3
    i = pl.program_id(0)
    win_rank = (i * gw) % wps
    sample = (i * gw) // wps

    if gw > 1:
        ch = _window_chunk(gw, t)
        rch = ch * t
        n_chunks = gw // ch
        hd = c // nhead
        inv_keep = 1.0 / max(1.0 - drop_rate, 1e-6)
        dn_qk = (((1,), (1,)), ((), ()))
        dn_av = (((1,), (0,)), ((), ()))
        dn_t = (((0,), (0,)), ((), ()))
        lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1) // hd
        prec = (jax.lax.Precision.HIGHEST if pk_ref.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)

        for s in range(n_chunks):
            @pl.when(win_rank + s * ch >= nw_ref[sample])
            def _zero(s=s):
                dout_ref[s * ch:(s + 1) * ch] = jnp.zeros((ch, t, c3),
                                                          dout_ref.dtype)

            @pl.when(win_rank + s * ch < nw_ref[sample])
            def _compute(s=s):
                if drop_rate > 0.0:
                    pltpu.prng_seed(seed_ref[0] + i * n_chunks + s)
                p = pk_ref[s * ch:(s + 1) * ch].reshape(rch, c3)
                q = p[:, :c]
                k = p[:, c:2 * c]
                v = p[:, 2 * c:]
                gout = g_ref[s * ch:(s + 1) * ch].reshape(rch, c)
                # one bias row per chunk (lane offset 0 — see _kernel_packed)
                bias = bias_ref[pl.ds(i * n_chunks + s, 1),
                                :].astype(jnp.float32)
                if ch > 1:
                    same_win = (jax.lax.broadcasted_iota(jnp.int32, (rch, rch), 0) // t ==
                                jax.lax.broadcasted_iota(jnp.int32, (rch, rch), 1) // t)
                    bias = jnp.where(same_win, bias, -1e9)
                dq = jnp.zeros((rch, c), jnp.float32)
                dk = jnp.zeros((rch, c), jnp.float32)
                dv = jnp.zeros((rch, c), jnp.float32)
                for h in range(nhead):
                    mask = (lane_head == h).astype(q.dtype)
                    maskf = mask.astype(jnp.float32)
                    qh = q * mask
                    gh = (gout * mask.astype(gout.dtype)).astype(v.dtype)
                    logits = jax.lax.dot_general(
                        qh, k, dn_qk, precision=prec,
                        preferred_element_type=jnp.float32)
                    attn = jax.nn.softmax(logits + bias, axis=-1)
                    if drop_rate > 0.0:
                        dmask = _dropout_mask((rch, rch), drop_rate) * inv_keep
                        attn_d = attn * dmask
                    else:
                        attn_d = attn
                    dv = dv + jax.lax.dot_general(
                        attn_d.astype(v.dtype), gh, dn_t, precision=prec,
                        preferred_element_type=jnp.float32)
                    dp = jax.lax.dot_general(gh, v, dn_qk, precision=prec,
                                             preferred_element_type=jnp.float32)
                    if drop_rate > 0.0:
                        dp = dp * dmask
                    ds = attn * (dp - jnp.sum(attn * dp, axis=-1, keepdims=True))
                    ds = ds.astype(k.dtype)
                    dq = dq + jax.lax.dot_general(
                        ds, k, dn_av, precision=prec,
                        preferred_element_type=jnp.float32) * maskf
                    dk = dk + jax.lax.dot_general(
                        ds, qh, dn_t, precision=prec,
                        preferred_element_type=jnp.float32) * maskf
                dpk = jnp.concatenate([dq, dk, dv], axis=-1)
                dout_ref[s * ch:(s + 1) * ch] = dpk.reshape(ch, t, c3).astype(
                    dout_ref.dtype)
        return

    @pl.when(win_rank >= nw_ref[sample])
    def _zero():
        dout_ref[:] = jnp.zeros(dout_ref.shape, dout_ref.dtype)

    @pl.when(win_rank < nw_ref[sample])
    def _compute():
        _kernel_packed_bwd_body(i, seed_ref, pk_ref, bias_ref, g_ref,
                                dout_ref, nhead=nhead, drop_rate=drop_rate)


def _kernel_packed_bwd_body(i, seed_ref, pk_ref, bias_ref, g_ref, dout_ref, *,
                            nhead: int, drop_rate: float):
    # NOTE: `i` (the grid index) is computed by the caller OUTSIDE the pl.when
    # branch — pl.program_id cannot be called inside the branch closure
    g, t, c3 = pk_ref.shape
    c = c3 // 3
    r = rk = g * t
    hd = c // nhead
    if drop_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + i)
    inv_keep = 1.0 / max(1.0 - drop_rate, 1e-6)
    p_all = pk_ref[:].reshape(r, c3)
    q = p_all[:, :c]
    k = p_all[:, c:2 * c]
    v = p_all[:, 2 * c:]
    gout = g_ref[:].reshape(r, c)
    bias = bias_ref[pl.ds(i, 1), :].astype(jnp.float32)
    if g > 1:
        same_win = (jax.lax.broadcasted_iota(jnp.int32, (r, rk), 0) // t ==
                    jax.lax.broadcasted_iota(jnp.int32, (r, rk), 1) // t)
        bias = jnp.where(same_win, bias, -1e9)

    dn_qk = (((1,), (1,)), ((), ()))     # a [QC,C] @ b[RK,C]^T -> [QC,RK]
    dn_av = (((1,), (0,)), ((), ()))     # a [QC,RK] @ b[RK,C]  -> [QC,C]
    dn_t = (((0,), (0,)), ((), ()))      # contract dim0 of both: a^T @ b
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1) // hd
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # Chunk-outer/head-inner, mirroring the forward exactly so the per-(chunk,
    # head) _dropout_mask calls land at the same stream positions. The ~6 live
    # f32 logit-shaped temporaries are [QC, RK] instead of [R, RK].
    qc = _row_chunk(r, rk, c3, jnp.dtype(pk_ref.dtype).itemsize)
    dk = jnp.zeros((rk, c), jnp.float32)
    dv = jnp.zeros((rk, c), jnp.float32)
    dq_rows = []
    for s in range(0, r, qc):
        qs = q[s:s + qc]
        gs = gout[s:s + qc]
        bias_s = bias if bias.shape[0] == 1 else bias[s:s + qc]
        dq_s = jnp.zeros((qc, c), jnp.float32)
        for h in range(nhead):
            mask = (lane_head == h).astype(q.dtype)
            maskf = mask.astype(jnp.float32)
            qh = qs * mask
            gh = (gs * mask.astype(gs.dtype)).astype(v.dtype)
            logits = jax.lax.dot_general(qh, k, dn_qk, precision=prec,
                                         preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(logits + bias_s, axis=-1)    # [QC, RK] f32
            if drop_rate > 0.0:
                dmask = _dropout_mask((qc, rk), drop_rate) * inv_keep
                attn_d = attn * dmask
            else:
                attn_d = attn
            # dv += attn_d^T @ g_h   (contract the QC dim of both)
            dv = dv + jax.lax.dot_general(attn_d.astype(v.dtype), gh, dn_t,
                                          precision=prec,
                                          preferred_element_type=jnp.float32)
            # d(attn_d) = g_h @ v^T ; d(attn) = that * dmask
            dp = jax.lax.dot_general(gh, v, dn_qk, precision=prec,
                                     preferred_element_type=jnp.float32)
            if drop_rate > 0.0:
                dp = dp * dmask
            # softmax backward: ds = attn * (dp - rowsum(attn * dp))
            ds = attn * (dp - jnp.sum(attn * dp, axis=-1, keepdims=True))
            ds = ds.astype(k.dtype)
            dq_s = dq_s + jax.lax.dot_general(
                ds, k, dn_av, precision=prec,
                preferred_element_type=jnp.float32) * maskf
            dk = dk + jax.lax.dot_general(
                ds, qh, dn_t, precision=prec,
                preferred_element_type=jnp.float32) * maskf
        dq_rows.append(dq_s)
    dq = dq_rows[0] if len(dq_rows) == 1 else jnp.concatenate(dq_rows, 0)
    dpk = jnp.concatenate([dq, dk, dv], axis=-1)
    dout_ref[:] = dpk.reshape(g, t, c3).astype(dout_ref.dtype)


def _train_call(kernel_body, packed, bias, seed, nw, nhead, drop_rate,
                extra=None, interpret=False):
    n, t, c3 = packed.shape
    c = c3 // 3
    g = _train_group(t, c, packed.dtype.itemsize)
    assert n % g == 0, (n, g)
    # one bias row per compute chunk (see fused_window_attention_packed)
    ch = _window_chunk(g, t)
    bias_rows = bias.reshape(n // ch, ch * t)
    if nw is None:
        nw_arr = jnp.full((1,), n, jnp.int32)
        wps = n
    else:
        nw_arr = jnp.asarray(nw, jnp.int32)
        assert n % nw_arr.shape[0] == 0, (n, nw_arr.shape)
        wps = n // nw_arr.shape[0]
    grid = (n // g,)
    pk_spec = pl.BlockSpec((g, t, c3), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((g, t, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    if extra is None:    # forward
        return pl.pallas_call(
            functools.partial(kernel_body, nhead=nhead, drop_rate=drop_rate,
                              wps=wps),
            grid=grid,
            in_specs=[smem, smem, pk_spec,
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=g_spec,
            out_shape=jax.ShapeDtypeStruct((n, t, c), packed.dtype),
            interpret=interpret,
        )(seed_arr, nw_arr, packed, bias_rows)
    return pl.pallas_call(                                     # backward
        functools.partial(kernel_body, nhead=nhead, drop_rate=drop_rate,
                          wps=wps),
        grid=grid,
        in_specs=[smem, smem, pk_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM), g_spec],
        out_specs=pk_spec,
        out_shape=jax.ShapeDtypeStruct((n, t, c3), packed.dtype),
        interpret=interpret,
    )(seed_arr, nw_arr, packed, bias_rows, extra)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def window_attention_packed_train(packed, bias, seed, nw, nhead: int,
                                  drop_rate: float, interpret: bool = False):
    """Differentiable fused window attention for TRAINING (verdict item 4:
    training previously fell back to the HBM-materialized einsum,
    swformer.py:108). packed [N,T,3C] = q|k|v on lanes; bias [N,T]; seed int32
    scalar array driving in-kernel attention dropout (cosine_msa.py:174);
    nw optional int32 [B] true window counts (empty-block skipping).
    Flash-style: neither forward nor backward ever materializes [N,H,T,T]
    logits in HBM; backward recomputes attn per head inside VMEM."""
    return _train_call(_kernel_packed_train, packed, bias, seed, nw, nhead,
                       drop_rate, interpret=interpret)


def _wapt_fwd(packed, bias, seed, nw, nhead, drop_rate, interpret=False):
    out = _train_call(_kernel_packed_train, packed, bias, seed, nw, nhead,
                      drop_rate, interpret=interpret)
    return out, (packed, bias, seed, nw)


def _wapt_bwd(nhead, drop_rate, interpret, res, gout):
    packed, bias, seed, nw = res
    dpacked = _train_call(_kernel_packed_bwd, packed, bias, seed, nw, nhead,
                          drop_rate, extra=gout, interpret=interpret)
    zb = jnp.zeros_like(bias)
    zs = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    znw = (None if nw is None
           else np.zeros(np.shape(nw), dtype=jax.dtypes.float0))
    return dpacked, zb, zs, znw


window_attention_packed_train.defvjp(_wapt_fwd, _wapt_bwd)


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
