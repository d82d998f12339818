"""Device-side connected-component glyph labeling.

Replaces the reference's per-sample CPU ``skimage.measure.label`` loop that
runs *inside* the training forward (``Dino/model/dino_vision.py:59-70`` +
``Dino/utils/DBSCAN.py:61-103``, the biggest GPU-blocking hot spot) with a
fully batched, jit-compatible algorithm designed around TPU cost realities
(measured on v5e: one 3x3 min-pool over (64,32,128) ≈ 30us, while ONE
(64,4096) gather/scatter/argsort ≈ 6-7ms):

  1. every foreground pixel starts with its raster index as label; repeated
     3x3 min-pooling (8-connectivity) floods each component with the raster
     index of its first pixel — the same component ordering
     ``skimage.measure.label`` produces. ``n_pool`` iterations handle any
     component of 8-connected graph diameter <= n_pool (default 128 >= the
     Chebyshev diameter of the full 32x128 grid, i.e. every convex and every
     realistic glyph component; raise it for pathological serpentine shapes).
     Pointer-jumping union-find was measured and REJECTED: once regions are
     star-compressed, jumps are no-ops and labels crawl 1px/pool anyway,
     while each jump costs a 6ms gather.
  2. the first ``max_components`` component roots (in label order) are
     selected with one small top_k; per-component size and mean-x statistics
     come from the component's support mask (cheap VPU compares/sums — no
     scatter-adds), components under ``min_area`` are dropped, the first
     ``num_slots`` survivors keep reference order semantics, and are finally
     sorted left-to-right by mean x — matching ``label_cluster`` exactly for
     masks with <= max_components components.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _propagate(lbl2d: jnp.ndarray, fg2d: jnp.ndarray, n_pool: int,
               big: int) -> jnp.ndarray:
    """Flood-fill labels by repeated masked 3x3 min-pooling. (B, H, W)."""

    def body(_, l):
        pooled = lax.reduce_window(
            jnp.where(fg2d, l, big), big, lax.min,
            window_dimensions=(1, 3, 3), window_strides=(1, 1, 1),
            padding=((0, 0), (1, 1), (1, 1)))
        return jnp.where(fg2d, jnp.minimum(l, pooled), l)

    return lax.fori_loop(0, n_pool, body, lbl2d)


@partial(jax.jit, static_argnames=("num_slots", "min_area", "n_pool",
                                   "max_components"))
def label_clusters(masks: jnp.ndarray, num_slots: int = 26, min_area: int = 30,
                   n_pool: int = 128, max_components: int = 64) -> jnp.ndarray:
    """Batched glyph labeling: (B, H, W) {0,1} masks -> (B, num_slots, H, W).

    Channel ``s`` is the one-hot support of the s-th character component in
    left-to-right order; empty slots are all-zero. Parity target:
    ``label_cluster()(mask)`` (``Dino/utils/DBSCAN.py:61-103``).
    """
    b, h, w = masks.shape
    hw = h * w
    big = hw  # sentinel larger than any real label

    fg2d = masks > 0.5
    idx2d = jnp.broadcast_to(
        jnp.arange(hw, dtype=jnp.int32).reshape(1, h, w), (b, h, w))
    lbl2d = _propagate(jnp.where(fg2d, idx2d, idx2d), fg2d, n_pool, big)

    # --- first `max_components` roots in raster (= skimage label) order
    roots = fg2d & (lbl2d == idx2d)
    key = jnp.where(roots, -idx2d, -big).reshape(b, hw)
    top_vals, _ = lax.top_k(key, max_components)           # (B, K)
    root_idx = -top_vals                                   # ascending raster order
    root_valid = root_idx < big                            # (B, K)

    # --- per-component stats from support masks (VPU compares, no scatters)
    chans = (lbl2d[:, None] == root_idx[:, :, None, None]) & fg2d[:, None]
    chans = chans & root_valid[:, :, None, None]           # (B, K, H, W)
    chans_f = chans.astype(jnp.float32)
    sizes = chans_f.sum(axis=(2, 3))                       # (B, K)
    cols = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    mean_x = (chans_f * cols).sum(axis=(2, 3)) / jnp.maximum(sizes, 1.0)

    # --- area filter, keep first `num_slots` survivors in root order
    survives = root_valid & (sizes >= min_area)
    # stable compaction: order by (dropped, position)
    k = root_idx.shape[1]
    pos = jnp.broadcast_to(jnp.arange(k)[None], (b, k))
    compact_key = jnp.where(survives, pos, k + pos)
    order1 = jnp.argsort(compact_key, axis=1)[:, :num_slots]      # (B, S)
    kept_valid = jnp.take_along_axis(survives, order1, axis=1)
    kept_meanx = jnp.where(kept_valid,
                           jnp.take_along_axis(mean_x, order1, axis=1), jnp.inf)

    # --- left-to-right ordering of the kept slots
    order2 = jnp.argsort(kept_meanx, axis=1)                      # (B, S)
    final_sel = jnp.take_along_axis(order1, order2, axis=1)       # (B, S)
    final_valid = jnp.take_along_axis(kept_valid, order2, axis=1)

    out = jnp.take_along_axis(
        chans_f, final_sel[:, :, None, None], axis=1)             # (B, S, H, W)
    return out * final_valid[:, :, None, None].astype(jnp.float32)
