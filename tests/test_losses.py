"""Loss parity tests vs the reference math (reproduced in torch)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ccd_tpu.losses import (
    dino_char_loss, dino_center_update, seg_loss, teacher_temp_schedule, tf_loss,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_seg_loss_matches_reference_double_softmax():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 32, 128, 2)).astype(np.float32)
    gt = (rng.random((4, 32, 128)) > 0.5).astype(np.float32)
    ours = float(seg_loss(jnp.asarray(logits), jnp.asarray(gt)))
    # reference: F.cross_entropy over softmaxed predictions (Dino_loss.py:15-26
    # called with backfore_softmax at :65-66)
    probs = F.softmax(torch.from_numpy(logits.transpose(0, 3, 1, 2)), dim=1)
    pred = probs.permute(0, 2, 3, 1).reshape(-1, 2)
    ref = F.cross_entropy(pred, torch.from_numpy(gt).view(-1).long()).item()
    assert abs(ours - ref) < 1e-6


def test_dino_char_loss_matches_reference_ragged_math():
    rng = np.random.default_rng(1)
    b, t, k = 3, 26, 64
    s = rng.normal(size=(2 * b, t, k)).astype(np.float32)
    te = rng.normal(size=(2 * b, t, k)).astype(np.float32)
    center = rng.normal(size=(1, k)).astype(np.float32)
    valid = np.zeros((b, t), bool)
    valid[0, :5] = True
    valid[1, :9] = True
    valid[2, :3] = True
    temp = 0.04

    ours = float(dino_char_loss(jnp.asarray(s), jnp.asarray(te), jnp.asarray(valid),
                                jnp.asarray(center), temp))

    # reference math (Dino_loss.py:81-102): flatten valid slots of both views,
    # chunk in 2, cross terms only, mean over flattened valid rows
    s_t = torch.from_numpy(s)
    te_t = torch.from_numpy(te)
    v = torch.from_numpy(valid)
    student_l = torch.cat([s_t[:b][v], s_t[b:][v]])
    teacher_l = torch.cat([te_t[:b][v], te_t[b:][v]])
    student_out = (student_l / 0.1).chunk(2)
    teacher_out = F.softmax((teacher_l - torch.from_numpy(center)) / temp, dim=-1).chunk(2)
    total, n_terms = 0.0, 0
    for iq, q in enumerate(teacher_out):
        for iv in range(2):
            if iv == iq:
                continue
            total += torch.sum(-q * F.log_softmax(student_out[iv], dim=-1), dim=-1).mean()
            n_terms += 1
    ref = (total / n_terms).item()
    assert abs(ours - ref) < 1e-5


def test_dino_center_update_matches_reference():
    rng = np.random.default_rng(2)
    b, t, k = 2, 26, 16
    te = rng.normal(size=(2 * b, t, k)).astype(np.float32)
    valid = np.zeros((b, t), bool)
    valid[0, :4] = True
    valid[1, :7] = True
    center = rng.normal(size=(1, k)).astype(np.float32)

    ours = np.asarray(dino_center_update(jnp.asarray(center), jnp.asarray(te),
                                         jnp.asarray(valid), momentum=0.9))

    te_t = torch.from_numpy(te)
    v = torch.from_numpy(valid)
    teacher_l = torch.cat([te_t[:b][v], te_t[b:][v]])  # (2*nvalid, K)
    batch_center = teacher_l.sum(0, keepdim=True) / len(teacher_l)
    ref = (torch.from_numpy(center) * 0.9 + batch_center * 0.1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_tf_loss_matches_torch_ce_ignore_index():
    rng = np.random.default_rng(3)
    n, t, c = 4, 10, 92
    pad = 92
    logits = rng.normal(size=(n, t, c)).astype(np.float32)
    targets = np.full((n, t), pad, np.int64)
    targets[:, 0] = 91
    targets[0, 1:5] = [3, 7, 2, 91]
    targets[1, 1:3] = [10, 91]
    targets[2, 1:8] = [5, 5, 5, 5, 5, 5, 91]
    targets[3, 1:2] = [91]

    ours = float(tf_loss(jnp.asarray(logits), jnp.asarray(targets), pad))

    out = torch.from_numpy(logits)[:, :-1].reshape(-1, c)
    tgt = torch.from_numpy(targets)[:, 1:].reshape(-1)
    ref = F.cross_entropy(out, tgt, ignore_index=pad, reduction="mean").item()
    assert abs(ours - ref) < 1e-5


def test_teacher_temp_schedule():
    s = teacher_temp_schedule(0.04, 0.07, 10, 100)
    assert len(s) == 100
    assert abs(s[0] - 0.04) < 1e-7
    assert abs(s[9] - 0.07) < 1e-7
    assert abs(s[50] - 0.07) < 1e-7
    # the reference default: no warmup, constant 0.04
    s2 = teacher_temp_schedule(0.04, 0.04, 0, 5)
    assert np.allclose(s2, 0.04)
