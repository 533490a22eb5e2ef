"""Losses vs hand-computed / reference-semantic oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from openseg3d_tpu.models.losses import (ce_loss, ohem_ce_loss,
                                         lovasz_softmax_loss, dice_loss,
                                         focal_loss)


def _np_softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_ce_matches_numpy_and_ignores():
    rng = np.random.RandomState(0)
    logits = rng.randn(50, 5).astype(np.float32)
    labels = rng.randint(0, 5, 50)
    labels[::7] = 255
    got = float(jax.jit(ce_loss)(jnp.asarray(logits), jnp.asarray(labels)))
    p = _np_softmax(logits)
    valid = labels != 255
    expect = -np.log(p[valid, labels[valid]]).mean()
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_ohem_keep_thresh():
    rng = np.random.RandomState(1)
    logits = rng.randn(100, 4).astype(np.float32) * 3
    labels = rng.randint(0, 4, 100)
    got = float(jax.jit(lambda a, b: ohem_ce_loss(a, b, keep_thresh=0.7))(
        jnp.asarray(logits), jnp.asarray(labels)))
    p = _np_softmax(logits)
    pt = p[np.arange(100), labels]
    keep = pt < 0.7
    expect = (-np.log(pt[keep])).mean()
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_ohem_keep_ratio():
    rng = np.random.RandomState(2)
    logits = rng.randn(100, 4).astype(np.float32)
    labels = rng.randint(0, 4, 100)
    got = float(jax.jit(lambda a, b: ohem_ce_loss(a, b, keep_ratio=0.3))(
        jnp.asarray(logits), jnp.asarray(labels)))
    nll = -np.log(_np_softmax(logits)[np.arange(100), labels])
    expect = np.sort(nll)[::-1][:30].mean()
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def _lovasz_oracle(probs, labels, ignore=255):
    """Direct transcription of lovasz_softmax_flat semantics
    (lovasz_loss.py:121-159) as the oracle."""
    valid = labels != ignore
    probs, labels = probs[valid], labels[valid]
    C = probs.shape[1]
    losses = []
    for c in range(C):
        fg = (labels == c).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probs[:, c])
        order = np.argsort(-errors, kind='stable')
        es, fs = errors[order], fg[order]
        gts = fs.sum()
        inter = gts - np.cumsum(fs)
        union = gts + np.cumsum(1 - fs)
        jac = 1 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        losses.append((np.maximum(es, 0) * jac).sum())
    return np.mean(losses)


def test_lovasz_matches_oracle():
    rng = np.random.RandomState(3)
    logits = rng.randn(200, 6).astype(np.float32)
    labels = rng.randint(0, 6, 200)
    labels[::9] = 255
    got = float(jax.jit(lovasz_softmax_loss)(jnp.asarray(logits), jnp.asarray(labels)))
    expect = _lovasz_oracle(_np_softmax(logits).astype(np.float64), labels)
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_lovasz_padding_invariance():
    """Appending ignore-labeled rows must not change the loss."""
    rng = np.random.RandomState(4)
    logits = rng.randn(64, 5).astype(np.float32)
    labels = rng.randint(0, 5, 64)
    base = float(jax.jit(lovasz_softmax_loss)(jnp.asarray(logits), jnp.asarray(labels)))
    pad_logits = np.concatenate([logits, rng.randn(32, 5).astype(np.float32)])
    pad_labels = np.concatenate([labels, np.full(32, 255)])
    padded = float(jax.jit(lovasz_softmax_loss)(jnp.asarray(pad_logits),
                                                jnp.asarray(pad_labels)))
    np.testing.assert_allclose(base, padded, rtol=1e-5)


def test_all_losses_finite_gradients():
    rng = np.random.RandomState(5)
    logits = jnp.asarray(rng.randn(80, 5).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 5, 80))
    for fn in (ce_loss,
               lambda a, b: ohem_ce_loss(a, b, keep_thresh=0.7),
               lambda a, b: ohem_ce_loss(a, b, keep_ratio=0.3),
               lovasz_softmax_loss, dice_loss, focal_loss):
        g = jax.jit(jax.grad(fn))(logits, labels)
        assert bool(jnp.isfinite(g).all()), fn
    # and with ALL labels ignored
    ig = jnp.full(80, 255)
    for fn in (ce_loss, lovasz_softmax_loss, dice_loss, focal_loss,
               lambda a, b: ohem_ce_loss(a, b, keep_thresh=0.7)):
        v = jax.jit(fn)(logits, ig)
        g = jax.jit(jax.grad(fn))(logits, ig)
        assert float(v) == 0.0 and bool(jnp.isfinite(g).all())


def test_lovasz_custom_vjp_matches_autodiff_reference():
    """The sort-payload forward + sort-based backward (no permutation
    gathers/scatters) must reproduce the plain argsort+gather implementation's
    loss AND gradient exactly."""

    def reference(logits, labels, ignore_index=255):
        valid = (labels != ignore_index) & (labels >= 0)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        safe = jnp.where(valid, labels, 0)

        def one_class(c):
            fgf = ((safe == c) & valid).astype(jnp.float32)
            errors = jnp.where(valid, jnp.abs(fgf - probs[:, c]), -jnp.inf)
            order = jnp.argsort(errors, descending=True)
            errors_sorted = errors[order]
            fg_sorted = fgf[order]
            valid_sorted = valid[order].astype(jnp.float32)
            gts = jnp.sum(fgf)
            inter = gts - jnp.cumsum(fg_sorted)
            union = gts + jnp.cumsum(valid_sorted * (1.0 - fg_sorted))
            jacc = 1.0 - inter / jnp.maximum(union, 1.0)
            w = jnp.concatenate([jacc[:1], jacc[1:] - jacc[:-1]])
            loss_c = jnp.sum(jax.nn.relu(
                jnp.where(jnp.isfinite(errors_sorted), errors_sorted, 0.0)) * w)
            return loss_c, (gts > 0).astype(jnp.float32)

        losses, present = jax.vmap(one_class)(jnp.arange(logits.shape[-1]))
        return jnp.sum(losses * present) / jnp.maximum(jnp.sum(present), 1.0)

    rng = np.random.RandomState(11)
    logits = jnp.asarray(rng.randn(512, 7).astype(np.float32))
    labels = jnp.asarray(np.where(rng.rand(512) < 0.15, 255,
                                  rng.randint(0, 7, 512)))
    l_new = float(jax.jit(lovasz_softmax_loss)(logits, labels))
    l_ref = float(jax.jit(reference)(logits, labels))
    np.testing.assert_allclose(l_new, l_ref, rtol=1e-6)
    g_new = jax.jit(jax.grad(lovasz_softmax_loss))(logits, labels)
    g_ref = jax.jit(jax.grad(reference))(logits, labels)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-9, rtol=1e-5)
