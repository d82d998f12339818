"""Vectorized 1-D 2-means foreground/background mask generation.

Parity target: ``clusterpixels(im, 2)`` (``Dino/utils/kmeans.py:7-23`` and its
copies in ``mask_create/generate_mask.py:13`` / ``Dino/model/utils.py:93``):
k-means over flattened grayscale intensities, then a border-majority polarity
flip so foreground (text) is 1.

The reference uses ``scipy.cluster.vq.kmeans`` (randomized init); here we run
deterministic Lloyd iterations from 25th/75th-percentile-ish centroids, which
converges to the same 2-way intensity partition for any non-degenerate image,
is fully batched, and jit-compiles (fixed iteration count — no data-dependent
control flow).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("iters",))
def kmeans_foreground_mask(gray: jnp.ndarray, iters: int = 16) -> jnp.ndarray:
    """(B, H, W) grayscale [0,255] or [0,1] -> (B, H, W) float {0,1} text mask."""
    b, h, w = gray.shape
    x = gray.reshape(b, -1).astype(jnp.float32)

    lo = jnp.min(x, axis=1, keepdims=True)
    hi = jnp.max(x, axis=1, keepdims=True)
    c0 = lo + 0.25 * (hi - lo)
    c1 = lo + 0.75 * (hi - lo)

    def step(_, carry):
        c0, c1 = carry
        assign = (jnp.abs(x - c1) < jnp.abs(x - c0)).astype(jnp.float32)  # 1 -> cluster c1
        n1 = jnp.sum(assign, axis=1, keepdims=True)
        n0 = x.shape[1] - n1
        s1 = jnp.sum(x * assign, axis=1, keepdims=True)
        s0 = jnp.sum(x, axis=1, keepdims=True) - s1
        new_c0 = jnp.where(n0 > 0, s0 / jnp.maximum(n0, 1), c0)
        new_c1 = jnp.where(n1 > 0, s1 / jnp.maximum(n1, 1), c1)
        return new_c0, new_c1

    c0, c1 = jax.lax.fori_loop(0, iters, step, (c0, c1))
    code = (jnp.abs(x - c1) < jnp.abs(x - c0)).astype(jnp.int32).reshape(b, h, w)

    # border-majority polarity fix (kmeans.py:15-23): if >= 3 of the four
    # borders are majority-1, the clusters are inverted (background got 1)
    fc = jnp.sum(code[:, :, 0], axis=1)
    lc = jnp.sum(code[:, :, -1], axis=1)
    fr = jnp.sum(code[:, 0, :], axis=1)
    lr = jnp.sum(code[:, -1, :], axis=1)
    num = ((fr > w // 2).astype(jnp.int32) + (lr > w // 2).astype(jnp.int32)
           + (fc > h // 2).astype(jnp.int32) + (lc > h // 2).astype(jnp.int32))
    flip = (num >= 3)[:, None, None]
    return jnp.where(flip, 1 - code, code).astype(jnp.float32)
