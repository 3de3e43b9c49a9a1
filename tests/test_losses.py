"""Loss-function equivalence tests against torch oracles.

torch (CPU) is used purely as a numerical oracle for the reference semantics
(utils/loss_functions.py) — the implementations under test are pure JAX.
"""
import numpy as np
import torch
import torch.nn.functional as F

from openess_tpu.losses import (
    cosine_distill,
    cross_entropy,
    dice_loss,
    nce_loss,
    sym_js_div,
    task_loss,
)

IGN = 255


def make_batch(rng, B=2, H=9, W=13, C=6, ignore_frac=0.2):
    logits = rng.normal(size=(B, H, W, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(B, H, W)).astype(np.int64)
    ign = rng.random(labels.shape) < ignore_frac
    labels[ign] = IGN
    return logits, labels


def test_cross_entropy_matches_torch(rng):
    logits, labels = make_batch(rng)
    ours = float(cross_entropy(logits, labels, ignore_index=IGN))
    ref = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels),
        ignore_index=IGN,
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_dice_matches_torch_reference(rng):
    logits, labels = make_batch(rng)
    C = logits.shape[-1]
    ours = float(dice_loss(logits, labels, num_classes=C, ignore_index=IGN))

    # torch oracle re-deriving loss_functions.py:96-135
    pred = torch.from_numpy(logits).permute(0, 3, 1, 2)  # [N, C, H, W]
    tgt = torch.from_numpy(labels)
    mask = tgt != IGN
    tgt_m = (tgt * mask).long()
    onehot = torch.zeros_like(pred).scatter_(1, tgt_m.unsqueeze(1), 1)
    onehot = onehot * mask.unsqueeze(1)
    probs = F.softmax(pred, dim=1) * mask.unsqueeze(1)
    total = 0.0
    for i in range(C):
        p_i = probs[:, i].reshape(pred.shape[0], -1)
        t_i = onehot[:, i].reshape(pred.shape[0], -1)
        num = 2 * (p_i * t_i).sum() + 1
        den = (p_i.pow(2) + t_i.pow(2)).sum() + 1
        total += 1 - num / den
    ref = (total / C).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_task_loss_is_sum_of_parts(rng):
    logits, labels = make_batch(rng)
    C = logits.shape[-1]
    t = float(task_loss(logits, labels, num_classes=C, ignore_index=IGN))
    d = float(dice_loss(logits, labels, num_classes=C, ignore_index=IGN))
    c = float(cross_entropy(logits, labels, ignore_index=IGN))
    np.testing.assert_allclose(t, d + c, rtol=1e-6)


def test_nce_matches_torch(rng):
    k = rng.normal(size=(40, 16)).astype(np.float32)
    q = rng.normal(size=(40, 16)).astype(np.float32)
    ours = float(nce_loss(k, q, temperature=0.07))
    logits = torch.from_numpy(k) @ torch.from_numpy(q).T
    ref = F.cross_entropy(logits / 0.07, torch.arange(40)).item()
    # fp32 matmul association differences are amplified by the 1/0.07 scale
    np.testing.assert_allclose(ours, ref, rtol=2e-3)


def test_sym_js_matches_torch(rng):
    a = rng.normal(size=(3, 5, 7, 4)).astype(np.float32)
    b = rng.normal(size=(3, 5, 7, 4)).astype(np.float32)
    ours = float(sym_js_div(a, b, axis=-1))
    ta = torch.from_numpy(a).permute(0, 3, 1, 2)
    tb = torch.from_numpy(b).permute(0, 3, 1, 2)
    kld = torch.nn.KLDivLoss()
    ref = (
        0.5 * kld(ta.softmax(1).clamp(min=1e-10).log(), tb.softmax(1).clamp(min=1e-10))
        + 0.5 * kld(tb.softmax(1).clamp(min=1e-10).log(), ta.softmax(1).clamp(min=1e-10))
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_cosine_distill_matches_torch(rng):
    a = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
    b = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
    ours = float(cosine_distill(a, b, axis=-1))
    ta = torch.from_numpy(a).permute(0, 3, 1, 2)
    tb = torch.from_numpy(b).permute(0, 3, 1, 2)
    ref = torch.mean(1 - F.cosine_similarity(ta, tb, dim=1)).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
