"""Segmentation losses on padded flat logits.

Parity targets: seg3d/models/losses/{ohem_cross_entropy_loss,lovasz_loss,
dice_loss,focal_loss}.py. Every loss takes logits [N, C] and int labels [N]
where ignore_index (255) marks both ignored ground truth and padded rows, so
static-shape masking is uniform.

The sort-heavy pieces (OHEM top-k, Lovasz) run inside the jitted step: invalid
entries are pushed to the sort tail with sentinel values and contribute exactly
zero, so padded buffers do not bias the losses (SURVEY.md §7.3 hard-part 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _valid(labels, ignore_index):
    return (labels != ignore_index) & (labels >= 0)


def cross_entropy(logits, labels, ignore_index: int = 255, class_weight=None):
    """Per-element CE with ignore mask; returns (losses [N], valid [N],
    norm [N]) where norm is the torch-convention mean denominator terms:
    per-element class weight when weighted (torch CE reduction='mean'
    divides by sum of target weights), else 1."""
    valid = _valid(labels, ignore_index)
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    if class_weight is not None:
        w = jnp.asarray(class_weight, dtype=nll.dtype)[safe]
        nll = nll * w
        norm = jnp.where(valid, w, 0.0)
    else:
        norm = valid.astype(nll.dtype)
    return jnp.where(valid, nll, 0.0), valid, norm


def ce_loss(logits, labels, ignore_index: int = 255, class_weight=None):
    losses, valid, norm = cross_entropy(logits, labels, ignore_index, class_weight)
    return jnp.sum(losses) / jnp.maximum(jnp.sum(norm), 1e-12)


def ohem_ce_loss(logits, labels, ignore_index: int = 255,
                 keep_ratio: float | None = None, keep_thresh: float | None = None,
                 class_weight=None):
    """Online hard example mining CE (ohem_cross_entropy_loss.py:23-38).

    keep_ratio: keep the top ratio*|valid| largest losses.
    keep_thresh: keep elements whose target-class prob < thresh.
    """
    losses, valid, norm = cross_entropy(logits, labels, ignore_index, class_weight)
    if keep_ratio is not None:
        n_valid = jnp.sum(valid)
        kept_count = (n_valid.astype(jnp.float32) * keep_ratio).astype(jnp.int32)
        sorted_losses = jnp.sort(jnp.where(valid, losses, -jnp.inf),
                                 descending=True, stable=False)
        keep = jnp.arange(losses.shape[0]) < kept_count
        kept = jnp.where(keep, sorted_losses, 0.0)
        return jnp.sum(kept) / jnp.maximum(kept_count, 1)
    elif keep_thresh is not None:
        safe = jnp.where(valid, labels, 0)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        p_t = jnp.take_along_axis(probs, safe[:, None], axis=-1)[:, 0]
        keep = valid & (p_t < keep_thresh)
        return jnp.sum(jnp.where(keep, losses, 0.0)) / jnp.maximum(jnp.sum(keep), 1)
    return jnp.sum(losses) / jnp.maximum(jnp.sum(norm), 1e-12)


def _lovasz_dot_impl(errors, fgf, validf):
    """Per-class Lovasz dot: errors/fgf/validf [C, N] -> loss_c [C].

    ONE multi-operand lax.sort carries fg/valid/original-index payloads along
    with the (negated) error keys, so no permutation gather ever materializes.
    The previous argsort + x[order] form lowered to three [C*N] scalar-row
    gathers in forward plus a scalar scatter in backward — ~200ms of the
    1146ms train step at Waymo caps (xplane: f32[22*163840] gather fusions at
    ~37ms each). A [22, N] payload sort costs ~7ms."""
    c, n = errors.shape
    # fg/valid/original-index PACKED into one s32 payload (fg bit | valid bit
    # | index): sort cost is per moved byte, so 2 moved columns instead of 4
    # (key + 3 payloads) — measured on the [22, 163840] point-loss sort
    ibits = max(n - 1, 1).bit_length()
    assert ibits + 2 <= 31, n
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (c, n))
    payload = ((fgf > 0).astype(jnp.int32) << (ibits + 1)) \
        | ((validf > 0).astype(jnp.int32) << ibits) | iota
    # ascending sort by -errors == descending by errors; invalid rows carry
    # +inf keys so they sort last
    neg = jnp.where(validf > 0, -errors, jnp.inf)
    # unstable: any order of equal errors yields a valid Lovasz subgradient,
    # and stable lax.sort adds a hidden iota tiebreak column
    neg_s, pay_s = jax.lax.sort((neg, payload), num_keys=1, dimension=-1,
                                is_stable=False)
    fg_s = ((pay_s >> (ibits + 1)) & 1).astype(jnp.float32)
    val_s = ((pay_s >> ibits) & 1).astype(jnp.float32)
    idx_s = pay_s & ((1 << ibits) - 1)
    errors_sorted = jnp.where(jnp.isfinite(neg_s), -neg_s, 0.0)

    gts = jnp.sum(fgf, axis=-1, keepdims=True)
    intersection = gts - jnp.cumsum(fg_s, axis=-1)
    union = gts + jnp.cumsum(val_s * (1.0 - fg_s), axis=-1)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1.0)
    w = jnp.concatenate([jaccard[:, :1], jaccard[:, 1:] - jaccard[:, :-1]],
                        axis=-1)
    w = w * val_s                                    # no pull toward padding
    loss_c = jnp.sum(jax.nn.relu(errors_sorted) * w, axis=-1)
    return loss_c, (errors_sorted, w, idx_s)


@jax.custom_vjp
def _lovasz_dot(errors, fgf, validf):
    return _lovasz_dot_impl(errors, fgf, validf)[0]


def _lovasz_dot_fwd(errors, fgf, validf):
    loss_c, res = _lovasz_dot_impl(errors, fgf, validf)
    return loss_c, res


def _lovasz_dot_bwd(res, g):
    """d loss_c / d errors[i] = w[j] * 1[errors_sorted[j] > 0] at i's sorted
    position j (the jaccard weights are constants w.r.t. logits, matching the
    reference's detached grad, lovasz_loss.py:30-44 torch.dot(..., Variable)).
    Unsorting is ANOTHER payload sort (key = original index) — the autodiff
    transpose would be a scalar scatter, just as slow as the gathers this
    rewrite removes."""
    errors_sorted, w, idx_s = res
    d_sorted = jnp.where(errors_sorted > 0, w, 0.0) * g[:, None]
    _, d_err = jax.lax.sort((idx_s, d_sorted), num_keys=1, dimension=-1,
                            is_stable=False)
    return d_err, jnp.zeros_like(d_err), jnp.zeros_like(d_err)


_lovasz_dot.defvjp(_lovasz_dot_fwd, _lovasz_dot_bwd)


def lovasz_softmax_loss(logits, labels, ignore_index: int = 255, class_weight=None):
    """Multi-class Lovasz-Softmax over the flattened batch
    (lovasz_loss.py:121-159 'present' classes, per_image=False)."""
    valid = _valid(labels, ignore_index)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    num_classes = logits.shape[-1]
    safe = jnp.where(valid, labels, 0)

    classes = jnp.arange(num_classes)
    fgf = ((safe[None, :] == classes[:, None]) & valid[None, :]) \
        .astype(jnp.float32)                                    # [C, N]
    validf = jnp.broadcast_to(valid[None, :],
                              fgf.shape).astype(jnp.float32)
    errors = jnp.abs(fgf - probs.T) * validf
    losses = _lovasz_dot(errors, fgf, validf)
    present = (jnp.sum(fgf, axis=-1) > 0).astype(jnp.float32)
    if class_weight is not None:
        losses = losses * jnp.asarray(class_weight, dtype=losses.dtype)
    return jnp.sum(losses * present) / jnp.maximum(jnp.sum(present), 1.0)


def dice_loss(logits, labels, ignore_index: int = 255, smooth: float = 1.0,
              exponent: float = 2.0):
    """Mean Dice over classes on softmax probs with one-hot targets
    (dice_loss.py:8-43)."""
    valid = _valid(labels, ignore_index)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    safe = jnp.where(valid, labels, 0)
    onehot = jax.nn.one_hot(safe, logits.shape[-1], dtype=jnp.float32)
    m = valid.astype(jnp.float32)[:, None]
    num = 2.0 * jnp.sum(probs * onehot * m, axis=0) + smooth
    den = jnp.sum((probs ** exponent + onehot ** exponent) * m, axis=0) + smooth
    return jnp.mean(1.0 - num / den)


def focal_loss(logits, labels, ignore_index: int = 255, gamma: float = 2.0,
               alpha: float = 0.25):
    """Sigmoid multi-label focal loss (focal_loss.py:51-92)."""
    valid = _valid(labels, ignore_index)
    safe = jnp.where(valid, labels, 0)
    onehot = jax.nn.one_hot(safe, logits.shape[-1], dtype=jnp.float32)
    x = logits.astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    pt = p * onehot + (1 - p) * (1 - onehot)
    at = alpha * onehot + (1 - alpha) * (1 - onehot)
    bce = jnp.logaddexp(0.0, jnp.where(onehot > 0, -x, x))
    loss = at * (1 - pt) ** gamma * bce
    loss = jnp.sum(loss, axis=-1)
    return jnp.sum(jnp.where(valid, loss, 0.0)) / jnp.maximum(jnp.sum(valid), 1)


def build_criterion(cfg, class_weight=None):
    """List of (loss_fn, weight) mirroring build_criterion (builder.py:26-40);
    supports the reference's 'ce'/'ohem_ce'/'lovasz' plus 'dice'/'focal'.

    DATASET.CLASS_WEIGHT is parsed but NOT fed to the losses unless
    MODEL.USE_CLASS_WEIGHT is set — exactly the reference's behavior: its
    builder never passes the weights to any loss (builder.py:27-40, the
    OHEMCrossEntropyLoss weight arg stays None), so the shipped SGD-lr-0.05
    recipe is tuned for the UNWEIGHTED landscape. Honoring the weights was a
    round-1..4 deviation here; measured on the r5 real-schema rehearsal it
    scales the init loss 73 vs ~10 (mean weight ~6, OHEM divides by kept
    COUNT — reference semantics, losses.mean()) and destabilizes training at
    the recipe's learning rates. OHEM uses MODEL.OHEM_KEEP_THRESH when set
    (the reference builder's choice, builder.py:32) and falls back to
    MODEL.OHEM_KEEP_RATIO otherwise, so neither config key is dead."""
    ignore = cfg.DATASET.IGNORE_INDEX
    use_cw = bool(cfg.MODEL.get('USE_CLASS_WEIGHT', False))
    if class_weight is None and use_cw and len(cfg.DATASET.CLASS_WEIGHT):
        class_weight = tuple(float(w) for w in cfg.DATASET.CLASS_WEIGHT)
    cw = class_weight
    out = []
    for name, weight in cfg.MODEL.LOSSES.items():
        if name == 'ce':
            fn = lambda lg, lb: ce_loss(lg, lb, ignore, class_weight=cw)
        elif name == 'ohem_ce':
            thresh = cfg.MODEL.OHEM_KEEP_THRESH
            ratio = None if thresh else cfg.MODEL.OHEM_KEEP_RATIO
            fn = lambda lg, lb, _t=thresh, _r=ratio: ohem_ce_loss(
                lg, lb, ignore, keep_ratio=_r, keep_thresh=_t, class_weight=cw)
        elif name == 'lovasz':
            fn = lambda lg, lb: lovasz_softmax_loss(lg, lb, ignore)
        elif name == 'dice':
            fn = lambda lg, lb: dice_loss(lg, lb, ignore)
        elif name == 'focal':
            fn = lambda lg, lb: focal_loss(lg, lb, ignore)
        else:
            raise NotImplementedError(f'loss {name!r}')
        out.append((fn, float(weight)))
    return out
