"""Cosine-with-linear-warmup schedules.

Parity targets: ``cosine_scheduler`` / ``cosine_iter_scheduler`` in
``Dino/modules/utils.py:187-210``. Besides the precomputed-array form we also
provide closed-form jit-friendly functions of the iteration index so the
schedule can live inside a compiled train step without host lookups.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def cosine_iter_schedule_array(base_value: float, final_value: float, niter: int,
                               warmup_iters: int = 0, start_warmup_value: float = 0.0) -> np.ndarray:
    """Precomputed per-iteration schedule (host-side, numpy)."""
    warmup = np.linspace(start_warmup_value, base_value, warmup_iters) if warmup_iters > 0 \
        else np.array([])
    iters = np.arange(niter - warmup_iters)
    schedule = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / len(iters)))
    schedule = np.concatenate((warmup, schedule))
    assert len(schedule) == niter
    return schedule


def cosine_epoch_schedule_array(base_value: float, final_value: float, epochs: int,
                                niter_per_ep: int, warmup_epochs: int = 0,
                                start_warmup_value: float = 0.0) -> np.ndarray:
    """Epoch-granular variant used by the finetune driver."""
    return cosine_iter_schedule_array(
        base_value, final_value, epochs * niter_per_ep,
        warmup_iters=int(warmup_epochs * niter_per_ep),
        start_warmup_value=start_warmup_value)


def cosine_iter_schedule(iteration, base_value: float, final_value: float, niter: int,
                         warmup_iters: int = 0, start_warmup_value: float = 0.0):
    """Closed-form schedule value at (possibly traced) ``iteration``.

    Matches :func:`cosine_iter_schedule_array` indexed at ``iteration`` up to
    float rounding; safe to call inside jit.
    """
    it = jnp.asarray(iteration, dtype=jnp.float32)
    warmup_iters = int(warmup_iters)
    if warmup_iters > 0:
        # np.linspace(start, base, n)[i] = start + i * (base-start)/(n-1)
        denom = max(warmup_iters - 1, 1)
        warm = start_warmup_value + it * (base_value - start_warmup_value) / denom
    else:
        warm = jnp.float32(base_value)
    n_cos = niter - warmup_iters
    cos_i = jnp.clip(it - warmup_iters, 0, n_cos - 1)
    cos_val = final_value + 0.5 * (base_value - final_value) * (
        1 + jnp.cos(jnp.pi * cos_i / n_cos))
    return jnp.where(it < warmup_iters, warm, cos_val)
