"""Training losses (reference: utils/loss_functions.py).

All functions are pure and jit-friendly; layout is NHWC: logits
``[B, H, W, C]``, integer labels ``[B, H, W]``.

- :func:`task_loss`       — Dice + CE combo (``TaskLoss``, loss_functions.py:6-24)
- :func:`dice_loss`       — multi-class Dice with ignore masking (:96-135)
- :func:`cross_entropy`   — mean CE with ignore_index (torch ``CrossEntropyLoss``)
- :func:`nce_loss`        — PointInfoNCE over pooled segment features (:138-154)
- :func:`sym_js_div`      — symmetric JS divergence (:27-37)
- :func:`cosine_distill`  — ``mean(1 - cos(a, b))`` SAM-feature distillation
  (pretrain_trainer.py:527)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def cross_entropy(logits: Array, labels: Array, *, ignore_index: int = 255) -> Array:
    """Mean cross-entropy over non-ignored pixels (torch CE semantics).

    Out-of-range labels (``>= C`` but ``!= ignore_index``) are treated as
    ignored — excluded from BOTH the numerator and the valid-pixel
    denominator — so corrupt labels fail loudly in coverage stats instead of
    silently contributing zero loss.
    """
    num_classes = logits.shape[-1]
    valid = (labels != ignore_index) & (labels >= 0) & (labels < num_classes)
    labels_safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot contraction instead of take_along_axis: the per-pixel gather
    # serializes on TPU (measured 21 ms/step on the B8 flagship vs <1 ms for
    # the C-wide multiply-sum), and its transpose is a scatter. Select the
    # target logp with where (not 0 * logp): a masked/-inf logit elsewhere in
    # the row must not turn the sum into 0 * (-inf) = NaN.
    onehot = jax.nn.one_hot(labels_safe, num_classes, dtype=logp.dtype)
    nll = -jnp.sum(jnp.where(onehot > 0, logp, 0.0), axis=-1)
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def dice_loss(
    logits: Array,
    labels: Array,
    *,
    num_classes: int,
    ignore_index: int = 255,
    smooth: float = 1.0,
    p: float = 2.0,
) -> Array:
    """Multi-class Dice, exactly mirroring the reference reduction.

    Per class: ``1 - (2*sum(pred*onehot) + s) / (sum(pred^p + onehot^p) + s)``
    with sums over the whole batch, averaged over ``num_classes``
    (loss_functions.py:75-135). Ignored pixels are zeroed in both tensors.
    """
    valid = (labels != ignore_index)[..., None]
    labels_safe = jnp.where(labels != ignore_index, labels, 0).astype(jnp.int32)
    onehot = jax.nn.one_hot(labels_safe, num_classes, dtype=jnp.float32) * valid
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) * valid

    # Reduce over batch+space per class (reference flattens [N, -1] then sums all).
    axes = tuple(range(logits.ndim - 1))
    num = 2.0 * jnp.sum(probs * onehot, axis=axes) + smooth
    den = jnp.sum(probs**p + onehot**p, axis=axes) + smooth
    per_class = 1.0 - num / den
    return jnp.sum(per_class) / num_classes


def task_loss(
    logits: Array,
    labels: Array,
    *,
    num_classes: int,
    ignore_index: int = 255,
    losses: tuple[str, ...] = ("dice", "cross_entropy"),
) -> Array:
    total = jnp.asarray(0.0, jnp.float32)
    if "dice" in losses:
        total = total + dice_loss(
            logits, labels, num_classes=num_classes, ignore_index=ignore_index
        )
    if "cross_entropy" in losses:
        total = total + cross_entropy(logits, labels, ignore_index=ignore_index)
    return total


def nce_loss(k: Array, q: Array, *, temperature: float = 0.07) -> Array:
    """PointInfoNCE: CE over ``k @ q.T / T`` with diagonal targets."""
    logits = jnp.dot(
        k.astype(jnp.float32), q.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    ) / temperature
    n = k.shape[0]
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.diagonal(logp))


def sym_js_div(pred: Array, target: Array, *, axis: int = -1) -> Array:
    """0.5*KL(sm(t)||sm(p)) + 0.5*KL(sm(p)||sm(t)), torch KLDivLoss('mean')
    semantics — i.e. the pointwise KL integrand averaged over *all* elements."""
    def kl_mean(log_p, q):
        # torch KLDivLoss: mean over elements of q * (log q - log_p)
        val = q * (jnp.log(q) - log_p)
        return jnp.mean(val)

    sp = jnp.clip(jax.nn.softmax(pred.astype(jnp.float32), axis=axis), 1e-10, None)
    st = jnp.clip(jax.nn.softmax(target.astype(jnp.float32), axis=axis), 1e-10, None)
    return 0.5 * kl_mean(jnp.log(sp), st) + 0.5 * kl_mean(jnp.log(st), sp)


def cosine_distill(teacher: Array, student: Array, *, axis: int = -1) -> Array:
    """``mean(1 - cosine_similarity)`` along ``axis`` (feature channels)."""
    t = teacher.astype(jnp.float32)
    s = student.astype(jnp.float32)
    num = jnp.sum(t * s, axis=axis)
    den = jnp.linalg.norm(t, axis=axis) * jnp.linalg.norm(s, axis=axis)
    cos = num / jnp.maximum(den, 1e-8)
    return jnp.mean(1.0 - cos)
