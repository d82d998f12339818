"""The jitted CCD pretraining step (student/teacher DINO over char features).

This is the TPU-native redesign of the reference hot loop
(``train.py:183-298`` + ``ABIDINOModel.forward``): ONE compiled function per
iteration containing student forward (ViT + SegHead), device-side glyph
clustering (no host round-trip, unlike ``dino_vision.py:59-70``), θ-warping,
char pooling + DINO head for student and teacher, both losses, backward,
per-param clipping, AdamW with scheduled lr/wd, the EMA teacher update, and
the DINO-center EMA. Under a 1-D data mesh the gradient/center/BatchNorm
reductions are global (GSPMD psum over ICI) with no explicit collectives.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import flax.struct
import jax
import jax.numpy as jnp
import optax

from ccd_tpu.losses import (dino_char_loss, dino_char_loss_fused,
                            dino_center_update, seg_loss)
from ccd_tpu.models.pretrain import CCDPretrainModel, char_validity_mask
from ccd_tpu.ops.cc_label import label_clusters
from ccd_tpu.ops.warp import affine_grid, grid_sample_binary_packed
from ccd_tpu.schedules import cosine_iter_schedule
from ccd_tpu.training.optim import (
    cancel_last_layer_grads, clip_gradients_per_param, ema_update,
)


@flax.struct.dataclass
class PretrainState:
    student_params: Any
    student_stats: Any
    teacher_params: Any
    opt_state: Any
    center: jnp.ndarray
    iteration: jnp.ndarray
    rng: jnp.ndarray


def init_pretrain_state(rng: jnp.ndarray, student: CCDPretrainModel,
                        teacher: CCDPretrainModel, image_hw=(32, 128),
                        num_slots: int = 26, optimizer: str = "adamw"
                        ) -> Tuple[PretrainState, optax.GradientTransformation]:
    """Build initial state: teacher starts as a copy of the student's
    backbone+head (train.py:109-110)."""
    from ccd_tpu.training.optim import make_optimizer
    h, w = image_hw
    init_rng, state_rng = jax.random.split(rng)
    images = jnp.zeros((2, h, w, 3), jnp.float32)
    clusters = jnp.zeros((2, num_slots, h, w), jnp.float32)
    variables = student.init({"params": init_rng, "dropout": init_rng},
                             images, clusters, train=False)
    student_params = variables["params"]
    student_stats = variables.get("batch_stats", {})
    # real copies — the teacher must not alias student buffers (donation safety)
    teacher_params = {"backbone": jax.tree.map(jnp.copy, student_params["backbone"]),
                      "head": jax.tree.map(jnp.copy, student_params["head"])}
    tx = make_optimizer(optimizer, student_params,
                        norm_last_layer=student.norm_last_layer)
    opt_state = tx.init(student_params)
    center = jnp.zeros((1, student.out_dim), jnp.float32)
    state = PretrainState(
        student_params=student_params, student_stats=student_stats,
        teacher_params=teacher_params, opt_state=opt_state, center=center,
        iteration=jnp.zeros((), jnp.int32), rng=state_rng)
    return state, tx


def pretrain_state_payload(state: "PretrainState") -> dict:
    """Checkpoint payload mirroring the reference's
    {student, teacher, optimizer, epoch/iteration, dino_loss-center}
    (train.py:197-207). The rng key is intentionally excluded and re-derived
    on resume. Used by both the train CLI and the resume tests."""
    return {"student_params": state.student_params,
            "student_stats": state.student_stats,
            "teacher_params": state.teacher_params,
            "opt_state": state.opt_state,
            "center": state.center, "iteration": state.iteration}


def make_pretrain_step(
    student: CCDPretrainModel,
    teacher: CCDPretrainModel,
    tx: optax.GradientTransformation,
    *,
    # schedule configuration (train.py:144-158)
    base_lr: float,
    min_lr: float,
    total_iters: int,
    warmup_iters: int,
    weight_decay: float,
    weight_decay_end: float,
    momentum_teacher: float,
    # loss configuration
    teacher_temps: np.ndarray,       # per-epoch teacher temperature
    student_temp: float = 0.1,
    center_momentum: float = 0.9,
    # training control
    clip_grad: Optional[float] = 3.0,
    freeze_last_layer: int = 1,
    global_batch: int = 64,
    imgnet_based: int = 1_000_000,
    gt_mask_epochs: int = 30,        # epoch threshold for GT vs predicted masks
    num_slots: int = 26,
    use_fused_ce: Optional[bool] = None,
    mesh=None,
    data_axis: str = "data",
):
    """Build the jitted train step. All arguments are static (baked into the
    compiled function); state/batch are the only traced inputs.

    ``use_fused_ce``: route the DINO CE through the fused Pallas kernel
    (one online-softmax pass over the (2B*T, 65536) logits, cross-view
    pairing via block addressing, pool_project(flat=True) rows). +10%
    step throughput on v5e (697.5 -> 769.6 img/s). ``None`` = auto: on
    whenever the kernel's lane-aligned row blocking is feasible
    (per-data-shard B*T % 128 == 0) and the DINO head is not
    tensor-parallel (the online softmax needs all K on one device; TP
    meshes keep the XLA chain, whose sharded-K softmax GSPMD handles).

    ``mesh``: the device mesh the caller will jit this step over. With a
    multi-device ``data_axis`` the fused path emits VIEW-MAJOR
    ``(2, B*T, K)`` logits — a sharding constraint on the small
    ``(2, B*T, 256)`` pooled char features (a ~3 MB resharding, vs ~870 MB
    if done on the logits) co-locates both views of each sample on one
    device, and the kernel runs under ``shard_map`` with zero collectives
    (see :func:`ccd_tpu.losses.dino_char_loss_fused`).
    """
    n_data = 1
    n_model = 1
    if mesh is not None:
        if data_axis in mesh.axis_names:
            n_data = mesh.shape[data_axis]
        if "model" in mesh.axis_names:
            n_model = mesh.shape["model"]
    if use_fused_ce is None:
        # infeasible batches (smoke runs) keep the XLA chain and the
        # un-flattened pool_project layout; TP head keeps the XLA chain
        use_fused_ce = (jax.default_backend() == "tpu"
                        and n_model == 1
                        and (mesh is not None or jax.device_count() == 1)
                        and (global_batch * num_slots) % (128 * n_data) == 0)
    view_major = use_fused_ce and n_data > 1
    temps = jnp.asarray(teacher_temps, jnp.float32)
    if view_major:
        from functools import partial
        from jax.sharding import NamedSharding, PartitionSpec
        ce_fn = partial(dino_char_loss_fused, mesh=mesh, data_axis=data_axis)
        pooled_sharding = NamedSharding(
            mesh, PartitionSpec(None, data_axis, None))
    elif use_fused_ce:
        ce_fn = dino_char_loss_fused
    else:
        ce_fn = dino_char_loss

    def step(state: PretrainState, images: jnp.ndarray, masks: jnp.ndarray,
             theta: jnp.ndarray) -> Tuple[PretrainState, Dict[str, jnp.ndarray]]:
        """images: (B, 3, H, W, 3) three views NHWC; masks: (B, H, W); theta: (B, 3, 3)."""
        b, _, h, w, _ = images.shape
        it = state.iteration
        # virtual-epoch bookkeeping (train.py:188)
        epoch = ((it + 1) * global_batch) // imgnet_based
        teacher_temp = jnp.take(temps, jnp.clip(epoch, 0, temps.shape[0] - 1))
        lr = cosine_iter_schedule(it, base_lr, min_lr, total_iters, warmup_iters)
        wd = cosine_iter_schedule(it, weight_decay, weight_decay_end, total_iters)
        m = cosine_iter_schedule(it, momentum_teacher, 1.0, total_iters)

        rng, drop1, drop2, drop3 = jax.random.split(state.rng, 4)
        x = jnp.concatenate([images[:, 1], images[:, 2]], axis=0)  # (2B, H, W, 3)
        grid = affine_grid(theta[:, :2, :].astype(jnp.float32), (h, w))

        def loss_fn(student_params):
            svars = {"params": student_params, "batch_stats": state.student_stats}
            (region_f, taps), _ = student.apply(
                svars, x, True, method="encode", mutable=["batch_stats"],
                rngs={"dropout": drop1})
            seg_logits, new_vars = student.apply(
                svars, taps, True, method="segment", mutable=["batch_stats"],
                rngs={"dropout": drop2})

            # ---- glyph clusters: GT masks early, self-predicted later
            # (dino_vision.py:59-70); non-differentiable pseudo-labels
            pred_fg = (jax.nn.softmax(seg_logits.astype(jnp.float32), axis=-1)
                       [..., 1] > 0.5).astype(jnp.float32)[:b]
            cluster_src_mask = jnp.where(epoch < gt_mask_epochs, masks, pred_fg)
            clusters_source = jax.lax.stop_gradient(
                label_clusters(cluster_src_mask, num_slots=num_slots))
            # warp clusters + GT mask to the view-2 frame in ONE packed-int32
            # bilinear warp (27 binary channels -> 4 single-channel gathers;
            # bit-exact vs per-channel grid_sample + >0.1, see warp.py)
            shifts = jnp.arange(num_slots, dtype=jnp.int32)
            packed = jnp.sum(
                (clusters_source > 0.5).astype(jnp.int32)
                * (1 << shifts)[None, :, None, None], axis=1)
            packed = packed | ((masks > 0.5).astype(jnp.int32) << num_slots)
            warped = grid_sample_binary_packed(packed, grid, num_slots + 1)
            clusters_image = jnp.moveaxis(warped[..., :num_slots], -1, 1)
            warped_gt = warped[..., num_slots]
            clusters = jnp.concatenate([clusters_source, clusters_image], axis=0)

            # flat=True (fused path) emits view-stacked (2B*T, K) rows —
            # the (N, T) collapse happens on the 256-wide head INPUT where
            # it is free, not on the 65536-wide output (pool_project doc).
            # view_major (fused + sharded): reshape the SMALL pooled
            # features to (2, B*T, E), pin both views of a sample onto the
            # same device, then project -> (2, B*T, K) logits whose
            # cross-view pairing is device-local for the shard_mapped kernel.
            tvars = {"params": state.teacher_params}
            t_region_f, _ = teacher.apply(tvars, x, False, method="encode")
            if view_major:
                pooled, index = student.apply(svars, region_f, clusters,
                                              method="pool")
                e = pooled.shape[-1]
                pooled = jax.lax.with_sharding_constraint(
                    pooled.reshape(2, -1, e), pooled_sharding)
                s_logits = student.apply(svars, pooled, True,
                                         method="project",
                                         rngs={"dropout": drop3})
                t_pooled, _ = teacher.apply(tvars, t_region_f, clusters,
                                            method="pool")
                t_pooled = jax.lax.with_sharding_constraint(
                    t_pooled.reshape(2, -1, e), pooled_sharding)
                t_logits = teacher.apply(tvars, t_pooled, False,
                                         method="project")
            else:
                s_logits, index = student.apply(
                    svars, region_f, clusters, True, method="pool_project",
                    rngs={"dropout": drop3}, flat=use_fused_ce)
                t_logits, _ = teacher.apply(tvars, t_region_f, clusters,
                                            False, method="pool_project",
                                            flat=use_fused_ce)
            valid = char_validity_mask(index[:b], num_slots)
            t_logits = jax.lax.stop_gradient(t_logits)

            # ---- losses (train.py:234-238 + Dino_loss.py:59-105);
            # warped_gt came from the packed warp above
            seg_gt = jnp.concatenate([masks, warped_gt], axis=0)
            l_seg = seg_loss(seg_logits, seg_gt)
            l_dino = ce_fn(s_logits, t_logits, valid, state.center,
                           teacher_temp, student_temp)
            total = l_seg + l_dino
            aux = {"batch_stats": new_vars["batch_stats"], "t_logits": t_logits,
                   "valid": valid, "mask_loss": l_seg, "dino_loss": l_dino}
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.student_params)

        grads = clip_gradients_per_param(grads, clip_grad)
        grads = cancel_last_layer_grads(grads, epoch < freeze_last_layer)

        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        opt_state.hyperparams["weight_decay"] = wd
        updates, new_opt_state = tx.update(grads, opt_state, state.student_params)
        # cancel_gradients_last_layer sets p.grad=None, which makes torch
        # AdamW skip the param entirely — weight decay included — so the
        # whole UPDATE is zeroed while frozen, not just the gradient.
        updates = cancel_last_layer_grads(updates, epoch < freeze_last_layer)
        new_student_params = optax.apply_updates(state.student_params, updates)

        # EMA teacher over backbone + head only (train.py:268-272)
        new_teacher_params = {
            "backbone": ema_update(state.teacher_params["backbone"],
                                   new_student_params["backbone"], m),
            "head": ema_update(state.teacher_params["head"],
                               new_student_params["head"], m),
        }
        new_center = dino_center_update(state.center, aux["t_logits"],
                                        aux["valid"], center_momentum,
                                        view_major=view_major)

        new_state = PretrainState(
            student_params=new_student_params, student_stats=aux["batch_stats"],
            teacher_params=new_teacher_params, opt_state=new_opt_state,
            center=new_center, iteration=it + 1, rng=rng)
        metrics = {"loss": loss, "mask_loss": aux["mask_loss"],
                   "dino_loss": aux["dino_loss"], "lr": lr, "wd": wd,
                   "epoch": epoch}
        return new_state, metrics

    return step


def make_fused_pretrain_step(student, teacher, tx, *, severity: int = 5, **kwargs):
    """Variant taking RAW images: the 3-view augmentation + θ generation run
    INSIDE the same jit as the train step (one compiled program per
    iteration, no intermediate host boundary). step(state, raw, masks) with
    raw (B, H, W, 3) float [0,1]."""
    from ccd_tpu.data.augment import pretrain_views

    inner = make_pretrain_step(student, teacher, tx, **kwargs)

    def step(state: PretrainState, raw: jnp.ndarray, masks: jnp.ndarray):
        # uint8 inputs are accepted and normalized ON DEVICE: through the
        # remote-dispatch tunnel the host->device transfer is the e2e
        # bottleneck, and uint8 images+masks are 4x smaller than float32
        if raw.dtype == jnp.uint8:
            raw = raw.astype(jnp.float32) / 255.0
        if masks.dtype != jnp.float32:
            masks = masks.astype(jnp.float32)
        rng, aug_key = jax.random.split(state.rng)
        views, theta = pretrain_views(aug_key, raw, severity=severity)
        return inner(state.replace(rng=rng), views, masks, theta)

    return step


def make_multi_pretrain_step(student, teacher, tx, *, severity: int = 5,
                             **kwargs):
    """K fused iterations in ONE compiled program via ``lax.scan`` over
    stacked batches: step(state, raws (K, B, H, W, 3), masks (K, B, H, W))
    -> (state, metrics stacked along K).

    Why: through this TPU's remote-dispatch tunnel a program launch costs
    ~2x the 63 ms device step itself (measured: 192 ms/iter wall vs 63 ms
    device); scanning K steps per dispatch amortizes that fixed latency to
    1/K. Iteration/epoch/schedule bookkeeping all live in the carried state,
    so semantics are identical to K separate dispatches.
    """
    inner = make_fused_pretrain_step(student, teacher, tx, severity=severity,
                                     **kwargs)

    def step(state: PretrainState, raws: jnp.ndarray, masks: jnp.ndarray):
        def body(st, xm):
            return inner(st, xm[0], xm[1])
        return jax.lax.scan(body, state, (raws, masks))

    return step
