"""Fused window attention kernel vs pure-XLA oracle.

The Pallas kernel runs in interpret mode on CPU (tests/conftest.py forces
JAX_PLATFORMS=cpu); on TPU the same kernel compiles via Mosaic and is
exercised by bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openseg3d_tpu.ops.attention import (attention_group,
                                         fused_window_attention,
                                         reference_window_attention)


def _case(rng, n, t, c, frac_pad):
    q = jnp.asarray(rng.randn(n, t, c), jnp.float32)
    k = jnp.asarray(rng.randn(n, t, c), jnp.float32)
    v = jnp.asarray(rng.randn(n, t, c), jnp.float32)
    valid = rng.rand(n, t) > frac_pad
    valid[:, 0] = True                      # at least one valid key per window
    bias = jnp.where(jnp.asarray(valid), 0.0, -1e9).astype(jnp.float32)
    return q, k, v, bias


@pytest.mark.parametrize('t,c,nhead', [(16, 48, 8), (64, 48, 8),
                                       (256, 96, 8), (800, 384, 8)])
def test_kernel_matches_oracle(t, c, nhead):
    rng = np.random.RandomState(0)
    g = attention_group(t)
    n = 2 * g
    q, k, v, bias = _case(rng, n, t, c, frac_pad=0.4)
    got = fused_window_attention(q, k, v, bias, nhead=nhead, interpret=True)
    want = reference_window_attention(q, k, v, bias, nhead=nhead)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fully_padded_window_is_finite_and_ignored():
    rng = np.random.RandomState(1)
    t, c = 16, 48
    g = attention_group(t)
    q, k, v, bias = _case(rng, g, t, c, frac_pad=0.0)
    bias = bias.at[0].set(-1e9)             # window 0 fully padded
    got = fused_window_attention(q, k, v, bias, nhead=8, interpret=True)
    assert np.isfinite(np.asarray(got)).all()


def test_bfloat16_inputs():
    rng = np.random.RandomState(2)
    t, c = 32, 96
    g = attention_group(t)
    q, k, v, bias = _case(rng, g, t, c, frac_pad=0.3)
    got = fused_window_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                                 v.astype(jnp.bfloat16), bias, nhead=8,
                                 interpret=True)
    want = reference_window_attention(q.astype(jnp.bfloat16),
                                      k.astype(jnp.bfloat16),
                                      v.astype(jnp.bfloat16), bias, nhead=8)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_block_diagonality():
    """A window's output must not depend on other windows in the same group."""
    rng = np.random.RandomState(3)
    t, c = 16, 48
    g = attention_group(t)
    q, k, v, bias = _case(rng, g, t, c, frac_pad=0.0)
    base = np.asarray(fused_window_attention(q, k, v, bias, nhead=8,
                                             interpret=True))
    v2 = v.at[1].add(100.0)                  # perturb window 1 only
    out2 = np.asarray(fused_window_attention(q, k, v2, bias, nhead=8,
                                             interpret=True))
    np.testing.assert_allclose(out2[0], base[0], rtol=1e-5, atol=1e-5)
    assert np.abs(out2[1] - base[1]).max() > 1.0


def test_packed_matches_unpacked():
    from openseg3d_tpu.ops.attention import fused_window_attention_packed
    rng = np.random.RandomState(5)
    for t, c in ((16, 48), (64, 96), (800, 384)):
        g = attention_group(t, c, 4)
        n = 2 * max(g, 1)
        q, k, v, bias = _case(rng, n, t, c, frac_pad=0.3)
        packed = jnp.concatenate([q, k, v], axis=-1)
        got = fused_window_attention_packed(packed, bias, nhead=8,
                                            interpret=True)
        want = reference_window_attention(q, k, v, bias, nhead=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_train_kernel_forward_and_grad_match_oracle():
    """Custom-VJP train kernel (drop_rate=0) vs the einsum oracle: both the
    forward and the packed gradient must agree (verdict item 4's grad-parity
    requirement)."""
    from openseg3d_tpu.ops.attention import window_attention_packed_train

    rng = np.random.RandomState(7)
    for t, c in ((16, 48), (64, 96)):
        from openseg3d_tpu.ops.attention import _train_group
        g = _train_group(t, c, 4)
        n = 2 * max(g, 1)
        q, k, v, bias = _case(rng, n, t, c, frac_pad=0.3)
        packed = jnp.concatenate([q, k, v], axis=-1)
        w = jnp.asarray(rng.randn(n, t, c), jnp.float32)
        seed = jnp.zeros((1,), jnp.int32)

        def loss_k(p):
            o = window_attention_packed_train(p, bias, seed, None, 8, 0.0, True)
            return jnp.sum(o * w)

        def loss_o(p):
            o = reference_window_attention(p[..., :c], p[..., c:2 * c],
                                           p[..., 2 * c:], bias, nhead=8)
            return jnp.sum(o * w)

        fk, gk = jax.value_and_grad(loss_k)(packed)
        fo, go = jax.value_and_grad(loss_o)(packed)
        np.testing.assert_allclose(float(fk), float(fo), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(go),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(jax.default_backend() != 'tpu',
                    reason='in-kernel PRNG dropout needs real Mosaic')
def test_train_kernel_dropout_tpu():
    """Dropout path on the real chip: deterministic per seed, different across
    seeds, unbiased in expectation, and the custom VJP matches a directional
    numerical derivative (fwd and bwd regenerate the same mask)."""
    from openseg3d_tpu.ops.attention import (window_attention_packed_train,
                                             _train_group)

    rng = np.random.RandomState(11)
    t, c, nh = 64, 96, 8
    g = _train_group(t, c, 4)
    n = 2 * g
    q, k, v, bias = _case(rng, n, t, c, frac_pad=0.2)
    packed = jnp.concatenate([q, k, v], axis=-1)
    s0 = jnp.asarray([123], jnp.int32)
    s1 = jnp.asarray([456], jnp.int32)

    a = np.asarray(window_attention_packed_train(packed, bias, s0, None, nh, 0.1))
    b = np.asarray(window_attention_packed_train(packed, bias, s0, None, nh, 0.1))
    d = np.asarray(window_attention_packed_train(packed, bias, s1, None, nh, 0.1))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - d).max() > 1e-4

    # unbiased: mean over many seeds approaches the no-dropout output
    outs = [np.asarray(window_attention_packed_train(
        packed, bias, jnp.asarray([s], jnp.int32), None, nh, 0.5))
        for s in range(24)]
    nodrop = np.asarray(window_attention_packed_train(packed, bias, s0, None, nh, 0.0))
    err = np.abs(np.mean(outs, 0) - nodrop).mean() / (np.abs(nodrop).mean() + 1e-9)
    assert err < 0.25, err

    # custom-VJP consistency: <grad, dir> == (f(x+eps d) - f(x-eps d)) / 2eps
    w = jnp.asarray(rng.randn(n, t, c), jnp.float32)
    f = lambda p: jnp.sum(window_attention_packed_train(p, bias, s0, None, nh, 0.1) * w)
    gk = jax.grad(f)(packed)
    dvec = jnp.asarray(rng.randn(*packed.shape), jnp.float32)
    eps = 1e-3
    num = (float(f(packed + eps * dvec)) - float(f(packed - eps * dvec))) / (2 * eps)
    ana = float(jnp.vdot(gk, dvec))
    np.testing.assert_allclose(num, ana, rtol=5e-3, atol=5e-2)


def test_train_kernel_chunked_rows_match_oracle(monkeypatch):
    """Query-row chunking (the T=800 VMEM fix) must be semantically invisible:
    force _row_chunk to pick a chunk smaller than the row count and re-check
    fwd + grad parity against the einsum oracle at a small shape."""
    import openseg3d_tpu.ops.attention as A

    monkeypatch.setattr(A, '_row_chunk', lambda r, rk, c3, isz: max(r // 4, 8))
    rng = np.random.RandomState(3)
    t, c, nh = 32, 48, 8
    g = A._train_group(t, c, 4)
    n = 2 * max(g, 1)
    q, k, v, bias = _case(rng, n, t, c, frac_pad=0.3)
    packed = jnp.concatenate([q, k, v], axis=-1)
    w = jnp.asarray(rng.randn(n, t, c), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)
    r = g * t
    assert max(r // 4, 8) < r  # the forced chunk actually splits rows

    def loss_k(p):
        o = A.window_attention_packed_train(p, bias, seed, None, nh, 0.0, True)
        return jnp.sum(o * w)

    def loss_o(p):
        o = reference_window_attention(p[..., :c], p[..., c:2 * c],
                                       p[..., 2 * c:], bias, nhead=nh)
        return jnp.sum(o * w)

    fk, gk = jax.value_and_grad(loss_k)(packed)
    fo, go = jax.value_and_grad(loss_o)(packed)
    np.testing.assert_allclose(float(fk), float(fo), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(go),
                               rtol=2e-4, atol=2e-4)


def test_empty_window_skipping_matches_full_compute():
    """Blocks past the true per-sample window count write zeros without
    computing; since padded windows hold all-zero v rows, the no-skip kernel
    output is identical. Windows >= nw get fully-padded bias/content here,
    mirroring the packed layout the window partition produces."""
    from openseg3d_tpu.ops.attention import (fused_window_attention_packed,
                                             window_attention_packed_train)
    rng = np.random.RandomState(3)
    b, wps, t, c, nh = 2, 64, 16, 64, 8          # wps = 2 groups of 32
    n = b * wps
    nw = jnp.asarray([3, 40], jnp.int32)         # true counts per sample
    packed = rng.randn(n, t, 3 * c).astype(np.float32)
    bias = np.zeros((n, t), np.float32)
    for s in range(b):
        for wi in range(wps):
            if wi >= int(nw[s]):                 # padding windows: no tokens
                packed[s * wps + wi] = 0.0
                bias[s * wps + wi] = -1e9
    packed = jnp.asarray(packed)
    bias = jnp.asarray(bias)

    full = fused_window_attention_packed(packed, bias, nhead=nh,
                                         interpret=True)
    skip = fused_window_attention_packed(packed, bias, nhead=nh,
                                         interpret=True, nw=nw)
    np.testing.assert_allclose(np.asarray(skip), np.asarray(full),
                               atol=1e-5)

    seed = jnp.asarray([7], jnp.int32)
    tfull = window_attention_packed_train(packed, bias, seed, None, nh, 0.0,
                                          True)
    tskip = window_attention_packed_train(packed, bias, seed, nw, nh, 0.0,
                                          True)
    np.testing.assert_allclose(np.asarray(tskip), np.asarray(tfull),
                               atol=1e-5)

    # gradients skip the same blocks. The cotangent of padded window slots is
    # zero in the model (window_to_flat only gathers valid slots), which is
    # exactly what makes skipping lossless — mirror that here.
    mask = np.zeros((n, 1, 1), np.float32)
    for s in range(b):
        mask[s * wps:s * wps + int(nw[s])] = 1.0
    w = jnp.asarray(rng.randn(n, t, c).astype(np.float32) * mask)
    gfull = jax.grad(lambda p: jnp.sum(window_attention_packed_train(
        p, bias, seed, None, nh, 0.0, True) * w))(packed)
    gskip = jax.grad(lambda p: jnp.sum(window_attention_packed_train(
        p, bias, seed, nw, nh, 0.0, True) * w))(packed)
    np.testing.assert_allclose(np.asarray(gskip), np.asarray(gfull),
                               atol=1e-5)
