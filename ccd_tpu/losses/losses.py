"""Training losses (pure functions over global-batch arrays).

Parity targets:
  * :func:`seg_loss` — ``SegLoss`` as *invoked* by ``DINOLoss.forward``
    (``Dino/loss/Dino_loss.py:59-68``): note the reference applies
    ``F.cross_entropy`` to an already-softmaxed prediction (a double softmax);
    reproduced as-is.
  * :func:`dino_char_loss` + :func:`dino_center_update` — ``DINOLoss``
    (``Dino_loss.py:35-143``) with the ragged valid-char concat replaced by a
    padded (B, 26) validity mask; the masked mean over (loss * mask) equals
    the reference's ``.mean()`` over the flattened valid rows. The center's
    ``dist.all_reduce`` is implicit: under pjit over a batch-sharded array the
    sums below are global.
  * :func:`tf_loss` — ``TFLoss`` (``Dino/loss/ce_loss.py:94-128``): shift-one
    teacher-forcing CE with ``ignore_index=PAD`` and mean reduction.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def seg_loss(seg_logits: jnp.ndarray, gt_masks: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel 2-class CE of softmaxed mask logits vs {0,1} GT.

    seg_logits: (N, H, W, 2); gt_masks: (N, H, W) in {0, 1}.
    """
    probs = jax.nn.softmax(seg_logits.astype(jnp.float32), axis=-1)
    logp = jax.nn.log_softmax(probs, axis=-1)  # reference's double softmax
    # class pick as arithmetic select, NOT take_along_axis: a per-pixel
    # gather over the size-2 class axis costs ~7 ms/step on TPU
    y = gt_masks.astype(jnp.float32)
    nll = -(logp[..., 0] * (1.0 - y) + logp[..., 1] * y)
    return jnp.mean(nll)


def teacher_temp_schedule(warmup_teacher_temp: float, teacher_temp: float,
                          warmup_teacher_temp_epochs: int, nepochs: int) -> np.ndarray:
    """Per-epoch teacher temperature (Dino_loss.py:47-51)."""
    return np.concatenate([
        np.linspace(warmup_teacher_temp, teacher_temp,
                    warmup_teacher_temp_epochs),
        np.ones(max(nepochs - warmup_teacher_temp_epochs, 0)) * teacher_temp,
    ]).astype(np.float32)


def dino_char_loss(student_logits: jnp.ndarray, teacher_logits: jnp.ndarray,
                   valid: jnp.ndarray, center: jnp.ndarray, teacher_temp,
                   student_temp: float = 0.1) -> jnp.ndarray:
    """Cross-view character-distillation CE.

    student_logits/teacher_logits: (2B, T, K) — view-1 then view-2 halves.
    valid: (B, T) bool char-slot mask (shared across views, dino_vision.py:87).
    center: (1, K) teacher centering state.
    """
    b = valid.shape[0]
    s = (student_logits / student_temp).astype(jnp.float32)
    s1, s2 = s[:b], s[b:]
    t = jax.nn.softmax(
        (teacher_logits.astype(jnp.float32) - center) / teacher_temp, axis=-1)
    t = jax.lax.stop_gradient(t)
    t1, t2 = t[:b], t[b:]

    w = valid.astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0)

    def term(q, v):
        ce = jnp.sum(-q * jax.nn.log_softmax(v, axis=-1), axis=-1)  # (B, T)
        return jnp.sum(ce * w) / denom

    # teacher view i distills into student view j != i (Dino_loss.py:94-102)
    return (term(t1, s2) + term(t2, s1)) / 2.0


def dino_char_loss_fused(student_logits: jnp.ndarray, teacher_logits: jnp.ndarray,
                         valid: jnp.ndarray, center: jnp.ndarray, teacher_temp,
                         student_temp: float = 0.1, mesh=None,
                         data_axis: str = "data") -> jnp.ndarray:
    """:func:`dino_char_loss` via the fused Pallas CE kernel (one HBM pass
    over the (rows, 65536) logits instead of several fp32 materializations).

    Numerically equivalent (fp32 online softmax); ``teacher_temp`` may be a
    traced scalar (fed to the kernel through SMEM).

    ``mesh``: sharded path. Logits must be VIEW-MAJOR ``(2, B*T, K)`` with
    axis 1 sharded over ``data_axis`` — both views of a sample then live on
    the same device and the kernel's half-rotated cross-view pairing
    (``swap_halves``) is purely device-local, so the kernel runs under
    ``shard_map`` with zero collectives; the masked mean below stays in
    GSPMD-land and reduces globally (the reference's ``dist.all_reduce``
    equivalents). Without a mesh, logits are the flat ``(2B*T, K)``
    view-stacked rows (single-device layout, identical memory order).
    """
    import logging

    from ccd_tpu.ops.fused_dino_ce import fused_dino_row_ce
    k = student_logits.shape[-1]
    b, t_slots = valid.shape

    n_data = 1
    if mesh is not None and data_axis in mesh.axis_names:
        n_data = mesh.shape[data_axis]
    if mesh is not None and n_data > 1:
        assert student_logits.ndim == 3 and student_logits.shape[0] == 2, \
            "sharded fused CE needs view-major (2, B*T, K) logits"
        rows_local = (b * t_slots) // n_data
        if jax.default_backend() == "tpu" and rows_local % 128 != 0:
            logging.warning(
                "fused DINO-CE falling back to the XLA chain: per-device "
                f"rows B*T/n_data = {b}*{t_slots}/{n_data} = {rows_local} "
                "is not a multiple of the 128-lane row block "
                "(~10% step-throughput loss; pick batch so that "
                "B*T % (128*data_parallel) == 0)")
            return dino_char_loss(
                student_logits.reshape(2 * b, t_slots, k),
                teacher_logits.reshape(2 * b, t_slots, k),
                valid, center, teacher_temp, student_temp)
        from jax.sharding import PartitionSpec as P

        def local_rows_ce(s, t, c, tt):
            # local shapes (2, rows_local, K): flatten view-major -> the
            # same [view-1 rows; view-2 rows] layout the kernel's
            # swap_halves addressing expects, now per device
            ce = fused_dino_row_ce(
                s.reshape(-1, k), jax.lax.stop_gradient(t.reshape(-1, k)),
                c, tt, float(student_temp), swap_halves=True)
            return ce.reshape(2, -1)

        ce2 = jax.shard_map(
            local_rows_ce, mesh=mesh,
            in_specs=(P(None, data_axis, None), P(None, data_axis, None),
                      P(None, None), P()),
            out_specs=P(None, data_axis), check_vma=False,
        )(student_logits, teacher_logits, center.reshape(1, k),
          jnp.asarray(teacher_temp, jnp.float32))
        w = valid.astype(jnp.float32).reshape(-1)          # (B*T,)
        denom = jnp.maximum(w.sum(), 1.0)
        return jnp.sum(ce2 * w[None, :]) / denom / 2.0

    if jax.default_backend() == "tpu" and (b * t_slots) % 128 != 0:
        logging.warning(
            "fused DINO-CE falling back to the XLA chain on TPU: "
            f"B*T = {b}*{t_slots} is not a multiple of 128 "
            "(~10% step-throughput loss; pick batch % 64 == 0 at T=26)")
        # Mosaic requires the kernel's (1, rows) CE/stats blocks to be
        # lane-aligned: with the half-rotated teacher addressing the row
        # block must divide rows/2 = B*T AND be a multiple of 128 — only
        # possible when B*T % 128 == 0 (e.g. T=26 needs batch % 64 == 0).
        # Infeasible geometries (smoke/test batch sizes) take the
        # numerically-equivalent XLA chain instead of failing to lower.
        # Interpret-mode tests (CPU backend) still exercise the kernel on
        # tiny shapes.
        return dino_char_loss(
            student_logits.reshape(2 * b, t_slots, k),
            teacher_logits.reshape(2 * b, t_slots, k),
            valid, center, teacher_temp, student_temp)
    if student_logits.ndim == 3:
        # production passes logits pre-flattened by pool_project(flat=True):
        # T=26 is not sublane-aligned, so flattening the (2B, T, K) head
        # output HERE is a full relayout copy (~4.6 ms/step) — only tests
        # take this branch
        student_logits = student_logits.reshape(-1, k)
        teacher_logits = teacher_logits.reshape(-1, k)
    # ONE kernel call over the view-stacked (2B*T, K) rows. The cross-view
    # pairing — teacher view i distills into student view j != i
    # (Dino_loss.py:94-102) — happens inside the kernel via the teacher
    # BlockSpec's half-rotated index map (swap_halves): any slice/concat
    # here would materialize copies of both logit tensors in HBM because a
    # pallas_call boundary cannot fuse.
    ce = fused_dino_row_ce(
        student_logits, jax.lax.stop_gradient(teacher_logits),
        center.reshape(1, k), teacher_temp, float(student_temp),
        swap_halves=True)
    w = valid.astype(jnp.float32).reshape(-1)
    w2 = jnp.concatenate([w, w])  # (2B*T,) — slot validity, shared per view
    denom = jnp.maximum(w.sum(), 1.0)
    # sum over both row halves = term(t1->s2) + term(t2->s1)
    return jnp.sum(ce * w2) / denom / 2.0


def dino_center_update(center: jnp.ndarray, teacher_logits: jnp.ndarray,
                       valid: jnp.ndarray, momentum: float = 0.9,
                       view_major: bool = False) -> jnp.ndarray:
    """EMA update of the teacher center over valid char slots of both views.

    teacher_logits: (2B, T, K), or (2B*T, K) view-stacked rows from
    ``pool_project(flat=True)``, or — with ``view_major`` — (2, B*T, K)
    from the sharded fused path; valid: (B, T) — applied to both halves,
    like the reference's concat of the two masked views
    (Dino_loss.py:133-143).
    """
    if view_major:
        w = valid.astype(jnp.float32).reshape(-1)  # (B*T,)
        w2 = jnp.stack([w, w])                     # (2, B*T)
        total = jnp.sum(teacher_logits.astype(jnp.float32) * w2[..., None],
                        axis=(0, 1), keepdims=False)[None]  # (1, K)
        count = jnp.maximum(w2.sum(), 1.0)
        return center * momentum + (total / count) * (1.0 - momentum)
    if teacher_logits.ndim == 2:
        w = valid.astype(jnp.float32).reshape(-1)
        w2 = jnp.concatenate([w, w])  # (2B*T,)
        total = jnp.sum(teacher_logits.astype(jnp.float32) * w2[:, None],
                        axis=0, keepdims=True)  # (1, K)
    else:
        w2 = jnp.concatenate([valid, valid], axis=0).astype(jnp.float32)  # (2B, T)
        total = jnp.sum(teacher_logits.astype(jnp.float32) * w2[..., None],
                        axis=(0, 1), keepdims=False)[None]  # (1, K)
    count = jnp.maximum(w2.sum(), 1.0)
    batch_center = total / count
    return center * momentum + batch_center * (1.0 - momentum)


def sinkhorn_knopp_teacher(teacher_output: jnp.ndarray, teacher_temp,
                           n_iterations: int = 3) -> jnp.ndarray:
    """Sinkhorn-Knopp teacher assignment (Dino_loss.py:157-184, the
    reference's alternative to softmax centering — present but unused there;
    provided for completeness). Under pjit the sums are global, replacing the
    explicit ``dist.all_reduce`` calls.

    teacher_output: (N, K) logits -> (N, K) assignment (rows sum to 1).
    """
    q = jnp.exp(teacher_output.astype(jnp.float32) / teacher_temp).T  # (K, N)
    n_total = q.shape[1]
    k = q.shape[0]
    q = q / jnp.sum(q)
    for _ in range(n_iterations):
        q = q / jnp.sum(q, axis=1, keepdims=True)
        q = q / k
        q = q / jnp.sum(q, axis=0, keepdims=True)
        q = q / n_total
    return (q * n_total).T


def tf_loss(logits: jnp.ndarray, targets: jnp.ndarray, ignore_index: int
            ) -> jnp.ndarray:
    """Teacher-forcing CE: drop last output / first target, mean over non-PAD.

    logits: (N, T, C-1); targets: (N, T) with BOS first.
    """
    out = logits[:, :-1].astype(jnp.float32)
    tgt = targets[:, 1:]
    mask = (tgt != ignore_index).astype(jnp.float32)
    logp = jax.nn.log_softmax(out, axis=-1)
    safe_tgt = jnp.clip(tgt, 0, out.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, safe_tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(mask.sum(), 1.0)
