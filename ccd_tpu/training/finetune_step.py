"""Jitted supervised-finetune step (teacher-forced CE recognition training).

Parity target: the ``train_finetune.py:262-290`` loop body — forward with
teacher forcing, CE over non-PAD targets, optional global-norm clipping,
AdamW with a cosine(warmup) lr schedule and constant weight decay.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ccd_tpu.losses import tf_loss
from ccd_tpu.models.recognizer import CCDRecognizer
from ccd_tpu.schedules import cosine_iter_schedule
from ccd_tpu.training.optim import clip_gradients_global_norm, make_adamw


@flax.struct.dataclass
class FinetuneState:
    params: Any
    opt_state: Any
    iteration: jnp.ndarray
    rng: jnp.ndarray


def init_finetune_state(rng: jnp.ndarray, model: CCDRecognizer,
                        image_hw=(32, 128)) -> Tuple[FinetuneState, optax.GradientTransformation]:
    h, w = image_hw
    init_rng, state_rng = jax.random.split(rng)
    img = jnp.zeros((2, h, w, 3), jnp.float32)
    targets = jnp.full((2, model.max_seq_len), model.padding_idx, jnp.int32)
    targets = targets.at[:, 0].set(model.start_idx)
    variables = model.init({"params": init_rng, "dropout": init_rng}, img, targets,
                           train_mode=True)
    params = variables["params"]
    tx = make_adamw(params)
    opt_state = tx.init(params)
    return FinetuneState(params=params, opt_state=opt_state,
                         iteration=jnp.zeros((), jnp.int32), rng=state_rng), tx


def finetune_state_payload(state: "FinetuneState",
                           best_accuracy: float = 0.0) -> dict:
    """Checkpoint payload mirroring the reference's ``{net, optimizer,
    iteration}`` periodic/best checkpoints (train_finetune.py:373-389,
    restored by ``restart_from_checkpoint``), plus ``best_accuracy`` so a
    preempted run resumes its best-checkpoint tracking (the reference resets
    best to 0 on restart). The rng key is intentionally excluded and
    re-derived on resume (see ``pretrain_state_payload``)."""
    return {"params": state.params, "opt_state": state.opt_state,
            "iteration": state.iteration,
            "best_accuracy": jnp.asarray(best_accuracy, jnp.float32)}


def make_finetune_step(
    model: CCDRecognizer,
    tx: optax.GradientTransformation,
    *,
    base_lr: float,
    min_lr: float,
    total_iters: int,
    warmup_iters: int,
    weight_decay: float,
    clip_grad: Optional[float] = None,
):
    def step(state: FinetuneState, images: jnp.ndarray, targets: jnp.ndarray
             ) -> Tuple[FinetuneState, Dict[str, jnp.ndarray]]:
        """images: (B, H, W, 3); targets: (B, T) padded target ids."""
        it = state.iteration
        lr = cosine_iter_schedule(it, base_lr, min_lr, total_iters, warmup_iters)
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            logits, _ = model.apply({"params": params}, images, targets,
                                    train_mode=True, deterministic=False,
                                    rngs={"dropout": dropout_rng})
            return tf_loss(logits, targets, model.padding_idx)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = clip_gradients_global_norm(grads, clip_grad)

        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        opt_state.hyperparams["weight_decay"] = jnp.asarray(weight_decay, jnp.float32)
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_state = FinetuneState(params=new_params, opt_state=new_opt_state,
                                  iteration=it + 1, rng=rng)
        return new_state, {"loss": loss, "lr": lr}

    return step


def make_fused_finetune_step(model: CCDRecognizer,
                             tx: optax.GradientTransformation, *,
                             aug_fn=None, **kwargs):
    """Variant taking raw float [0,1] images: device augmentation (abinet /
    staged supervised chain, or none) + ImageNet normalization run inside the
    same compiled program as the train step."""
    from ccd_tpu.data.augment import normalize

    inner = make_finetune_step(model, tx, **kwargs)

    def step(state: FinetuneState, images: jnp.ndarray, targets: jnp.ndarray):
        # uint8 accepted; normalized on device (see make_fused_pretrain_step)
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        rng, key = jax.random.split(state.rng)
        x = aug_fn(key, images) if aug_fn is not None else images
        return inner(state.replace(rng=rng), normalize(x), targets)

    return step


def make_multi_finetune_step(model: CCDRecognizer,
                             tx: optax.GradientTransformation, *,
                             aug_fn=None, **kwargs):
    """K fused finetune iterations per dispatch (``lax.scan`` over stacked
    (K, B, ...) batches) — same launch-latency amortization as
    ``make_multi_pretrain_step``."""
    inner = make_fused_finetune_step(model, tx, aug_fn=aug_fn, **kwargs)

    def step(state: FinetuneState, images: jnp.ndarray, targets: jnp.ndarray):
        def body(st, xm):
            return inner(st, xm[0], xm[1])
        return jax.lax.scan(body, state, (images, targets))

    return step
