"""Optimizer construction and gradient-control utilities.

Parity targets in ``Dino/modules/utils.py``: ``get_params_groups`` (biases and
1-D params not regularized, ``:643-654``), ``clip_gradients`` (PER-PARAMETER
norm clipping, ``:132-141``), ``cancel_gradients_last_layer`` (``:144-149``),
and the in-place EMA teacher update (``train.py:263-272``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def weight_decay_mask(params: Any, norm_last_layer: bool = True) -> Any:
    """True = regularized. Mirrors get_params_groups: names ending in 'bias'
    and rank<=1 params (LayerNorm scales, biases) get no weight decay.

    ``last_layer_g`` (the DINOHead weight-norm gain) is excluded only when
    ``norm_last_layer``: the reference then freezes it with
    ``requires_grad=False`` (vision_transformer.py:316-317), which drops it
    from ``get_params_groups`` entirely — so torch never weight-decays it,
    and with optax a zero gradient alone would NOT stop ``adamw`` from
    decaying it away from its frozen value of 1. With
    ``norm_last_layer=False`` (the shipped ViT-Small/Tiny configs) torch's
    ``weight_g`` is a trainable ndim-2 param that get_params_groups DOES
    regularize, so it must be decayed here too."""
    def keep(path, p):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "last_layer_g":
            return not norm_last_layer
        return (p.ndim > 1) and not name.endswith("bias")
    return jax.tree_util.tree_map_with_path(keep, params)


def make_adamw(params: Any, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
               norm_last_layer: bool = True) -> optax.GradientTransformation:
    """AdamW with injectable per-step lr/weight_decay and the reference's
    no-decay param grouping. Set ``opt_state.hyperparams['learning_rate']``
    and ``['weight_decay']`` each step."""
    mask = weight_decay_mask(params, norm_last_layer)
    return optax.inject_hyperparams(
        partial(optax.adamw, b1=b1, b2=b2, eps=eps, mask=mask)
    )(learning_rate=0.0, weight_decay=0.0)


def make_optimizer(name: str, params: Any,
                   norm_last_layer: bool = True) -> optax.GradientTransformation:
    """adamw / sgd / lars selection (train.py:132-137) with injectable
    lr/weight_decay hyperparams and the no-decay grouping for all three."""
    mask = weight_decay_mask(params, norm_last_layer)
    if name == "adamw":
        return make_adamw(params, norm_last_layer=norm_last_layer)
    if name == "sgd":
        def sgd(learning_rate, weight_decay):
            return optax.chain(
                optax.add_decayed_weights(weight_decay, mask=mask),
                optax.sgd(learning_rate, momentum=0.9))
        return optax.inject_hyperparams(sgd)(learning_rate=0.0, weight_decay=0.0)
    if name == "lars":
        def lars(learning_rate, weight_decay):
            return optax.lars(learning_rate, weight_decay=weight_decay,
                              weight_decay_mask=mask, momentum=0.9,
                              trust_ratio_mask=mask)
        return optax.inject_hyperparams(lars)(learning_rate=0.0, weight_decay=0.0)
    raise ValueError(f"unknown optimizer {name!r}")


def clip_gradients_per_param(grads: Any, clip: Optional[float]) -> Any:
    """Per-parameter L2 norm clipping (clip_gradients, utils.py:132-141)."""
    if not clip:
        return grads

    def clip_one(g):
        norm = jnp.linalg.norm(g.astype(jnp.float32))
        coef = clip / (norm + 1e-6)
        return jnp.where(coef < 1.0, g * coef.astype(g.dtype), g)

    return jax.tree.map(clip_one, grads)


def clip_gradients_global_norm(grads: Any, clip: Optional[float]) -> Any:
    """Global-norm clipping (torch.nn.utils.clip_grad_norm_, finetune path)."""
    if not clip:
        return grads
    norm = optax.global_norm(grads)
    coef = jnp.minimum(clip / (norm + 1e-6), 1.0)
    return jax.tree.map(lambda g: g * coef.astype(g.dtype), grads)


def cancel_last_layer_grads(grads: Any, freeze: jnp.ndarray) -> Any:
    """Zero DINO-head last-layer grads while ``freeze`` (traced bool) is set.

    Matches cancel_gradients_last_layer: params whose path contains
    'last_layer'. The reference sets ``p.grad = None`` which makes torch
    AdamW skip the parameter COMPLETELY (no weight decay either) — so the
    train step must also apply this to the optimizer *updates*, not just the
    gradients (see make_pretrain_step)."""
    scale = 1.0 - freeze.astype(jnp.float32)

    def maybe_zero(path, g):
        names = [p.key if hasattr(p, "key") else str(p) for p in path]
        if any("last_layer" in n for n in names):
            return g * scale.astype(g.dtype)
        return g

    return jax.tree_util.tree_map_with_path(maybe_zero, grads)


def ema_update(teacher_params: Any, student_params: Any, momentum) -> Any:
    """teacher = m * teacher + (1 - m) * student (train.py:263-272)."""
    return jax.tree.map(
        lambda t, s: t * momentum + s.astype(t.dtype) * (1.0 - momentum),
        teacher_params, student_params)
