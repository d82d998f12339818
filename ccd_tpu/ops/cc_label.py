"""Device-side connected-component glyph labeling.

Replaces the reference's per-sample CPU ``skimage.measure.label`` loop that
runs *inside* the training forward (``Dino/model/dino_vision.py:59-70`` +
``Dino/utils/DBSCAN.py:61-103``, the biggest GPU-blocking hot spot) with a
fully batched, jit-compatible algorithm designed around TPU cost realities
(measured on v5e: one 3x3 min-pool over (64,32,128) ~ 30us, while ONE
(64,4096) gather/scatter/argsort ~ 6-7ms):

  1. every foreground pixel starts with its raster index as label; repeated
     3x3 min-pooling (8-connectivity) floods each component with the raster
     index of its first pixel — the same component ordering
     ``skimage.measure.label`` produces. Propagation is ADAPTIVE: a
     ``lax.while_loop`` runs chunks of ``n_pool`` pooling steps until a
     fixpoint, so arbitrarily serpentine components (exactly what the
     epoch>=30 self-predicted-mask regime produces) converge exactly, while
     typical glyph masks finish after two chunks. Pointer-jumping union-find
     was measured and REJECTED: once regions are star-compressed, jumps are
     no-ops and labels crawl 1px/pool anyway, while each jump costs a 6ms
     gather.
  2. per-component area and column-sum are computed for ALL components at
     once with a single batched ``segment_sum`` over the flat label image
     (one scatter-add), so the area filter runs BEFORE slot selection — the
     reference's exact semantics (``DBSCAN.py:78-97``: iterate labels in
     ascending order, drop area < 30, stop after 26 *survivors*). The
     round-1 version pre-selected 64 roots in raster order and then area-
     filtered, which could evict real glyphs behind >64 noise specks.
  3. the first ``num_slots`` surviving roots (raster order) are selected
     with one small ``top_k`` and finally sorted left-to-right by mean
     column — matching ``label_cluster`` exactly for every mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _sweep_min(l: jnp.ndarray, fg: jnp.ndarray, big: int,
               axis: int) -> jnp.ndarray:
    """Segmented min-sweep: every fg pixel takes the min label of its whole
    CONTIGUOUS fg run along ``axis`` (both directions) in one pass.

    A log-depth ``associative_scan`` with the standard segmented-scan
    combiner: state ``(v, m)`` where ``v`` is the min label of the run
    touching the scanned-from edge (``big`` when that edge pixel is bg, so
    connectivity is encoded in ``v`` itself) and ``m`` is "block entirely
    fg". One sweep replaces O(run-length) 3x3 min-pools — the long straight
    strokes of glyph masks flood in a single shot instead of 1px per pool.
    """
    v0 = jnp.where(fg, l, big)

    def combine(a, b):
        av, am = a
        bv, bm = b
        return jnp.where(bm, jnp.minimum(bv, av), bv), am & bm

    fwd, _ = lax.associative_scan(combine, (v0, fg), axis=axis)
    bwd, _ = lax.associative_scan(combine, (v0, fg), axis=axis, reverse=True)
    return jnp.where(fg, jnp.minimum(jnp.minimum(fwd, bwd), l), l)


def _propagate(lbl2d: jnp.ndarray, fg2d: jnp.ndarray, big: int,
               chunk: int) -> jnp.ndarray:
    """Flood-fill labels to a fixpoint. (B, H, W).

    Each round runs a row + column segmented min-sweep (long-range
    propagation along straight runs, :func:`_sweep_min`) followed by
    ``chunk`` 3x3 min-pool steps (the only ops that cross 8-connectivity's
    diagonal corner-touches); the while_loop re-runs rounds until a
    fixpoint, so labels are exact for any component shape (graph diameter
    bounded by H*W), unlike a fixed iteration count. Typical glyph masks
    converge in 2 rounds (flood + verify); pure-diagonal staircases — the
    worst case — advance ``chunk`` px per round through the pools alone.
    """

    def round_chunk(l):
        l = _sweep_min(l, fg2d, big, axis=2)
        l = _sweep_min(l, fg2d, big, axis=1)
        # unrolled (chunk is small + static): a fori_loop lowers to a nested
        # while whose per-iteration overhead exceeds the 30us pool itself
        for _ in range(chunk):
            pooled = lax.reduce_window(
                jnp.where(fg2d, l, big), big, lax.min,
                window_dimensions=(1, 3, 3), window_strides=(1, 1, 1),
                padding=((0, 0), (1, 1), (1, 1)))
            l = jnp.where(fg2d, jnp.minimum(l, pooled), l)
        return l

    def cond(carry):
        _, changed = carry
        return changed

    def body(carry):
        l, _ = carry
        nl = round_chunk(l)
        return nl, jnp.any(nl != l)

    out, _ = lax.while_loop(cond, body, (lbl2d, jnp.asarray(True)))
    return out


def _order_slots(sel_c, mean_x, valid):
    """Sort kept slots left-to-right by mean column (DBSCAN.py:93-95).

    sel_c: (B, S) raster root indices (clamped); mean_x: (B, S) with inf for
    invalid; valid: (B, S). Returns (sel_sorted, valid_sorted)."""
    order = jnp.argsort(jnp.where(valid, mean_x, jnp.inf), axis=1, stable=True)
    return (jnp.take_along_axis(sel_c, order, axis=1),
            jnp.take_along_axis(valid, order, axis=1))


@partial(jax.jit, static_argnames=("num_slots", "min_area", "n_pool",
                                   "fast_k", "mid_k"))
def label_clusters(masks: jnp.ndarray, num_slots: int = 26, min_area: int = 30,
                   n_pool: int = 8, fast_k: int = 64,
                   mid_k: int = 256) -> jnp.ndarray:
    """Batched glyph labeling: (B, H, W) {0,1} masks -> (B, num_slots, H, W).

    Channel ``s`` is the one-hot support of the s-th surviving character
    component in left-to-right order; empty slots are all-zero. Parity
    target: ``label_cluster()(mask)`` (``Dino/utils/DBSCAN.py:61-103``) —
    exact on arbitrary masks, including noisy predicted masks with any
    number of sub-threshold components (fuzz-tested vs a BFS reference).

    Component statistics come from one of three exact paths chosen at
    runtime by nested ``lax.cond`` on the max per-image component count:
    <= ``fast_k`` (the overwhelmingly common case for both GT and predicted
    masks) and <= ``mid_k`` (specky epoch>=30 self-predicted masks) compute
    per-root area/mean-x with VPU/MXU compare-sums over the first K raster
    roots (~0.3-0.7 ms; the support one-hot is bf16 with fp32 accumulation,
    exact for 0/1 values and integer columns < 256); only masks with more
    than ``mid_k`` components fall back to the batched ``segment_sum`` over
    ALL components (a scatter-add, ~6-7 ms on TPU — the price of extreme
    speck storms, paid only when they occur).
    """
    b, h, w = masks.shape
    hw = h * w
    big = hw  # sentinel larger than any real label
    s_slots = num_slots

    fg2d = masks > 0.5
    idx2d = jnp.broadcast_to(
        jnp.arange(hw, dtype=jnp.int32).reshape(1, h, w), (b, h, w))
    lbl2d = _propagate(idx2d, fg2d, big, n_pool)

    flat_lbl = lbl2d.reshape(b, hw)
    flat_fg = fg2d.reshape(b, hw)
    flat_idx = jnp.arange(hw, dtype=jnp.int32)[None, :]
    cols_f = (jnp.arange(hw, dtype=jnp.int32) % w).astype(jnp.float32)
    roots = flat_fg & (flat_lbl == flat_idx)

    ones_cols = jnp.stack([jnp.ones_like(cols_f), cols_f], axis=1
                          ).astype(jnp.bfloat16)           # (HW, 2)

    def make_fast_path(k_roots):
        def fast_path(_):
            # areas/mean-x for the first `k_roots` roots via compare-sums:
            # the bf16 one-hot support matmuls against [1, col] with fp32
            # accumulation (both exact: 0/1 values, integer cols < 256)
            key = jnp.where(roots, -flat_idx, -big)
            top_vals, _ = lax.top_k(key, k_roots)          # (B, K)
            ridx = -top_vals                               # ascending raster
            rvalid = ridx < big
            support = ((flat_lbl[:, None, :] == ridx[:, :, None])
                       & flat_fg[:, None, :]).astype(jnp.bfloat16)  # (B,K,HW)
            sums = jax.lax.dot_general(
                support, ones_cols, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (B, K, 2)
            areas_k, sumx_k = sums[..., 0], sums[..., 1]
            survives = rvalid & (areas_k >= float(min_area))
            # first `num_slots` survivors in raster order (stable compaction)
            pos = jnp.broadcast_to(jnp.arange(k_roots)[None], (b, k_roots))
            compact = jnp.where(survives, pos, k_roots + pos)
            order1 = jnp.argsort(compact, axis=1)[:, :s_slots]
            kept_valid = jnp.take_along_axis(survives, order1, axis=1)
            mean_k = sumx_k / jnp.maximum(areas_k, 1.0)
            kept_meanx = jnp.take_along_axis(mean_k, order1, axis=1)
            sel = jnp.minimum(jnp.take_along_axis(ridx, order1, axis=1), hw - 1)
            return _order_slots(sel, kept_meanx, kept_valid)
        return fast_path

    def exact_path(_):
        # ALL components via one batched scatter-add (component id == root
        # raster index); area-filter BEFORE selection (DBSCAN.py:85-92)
        data = jnp.stack([flat_fg.astype(jnp.float32),
                          flat_fg.astype(jnp.float32) * cols_f[None, :]],
                         axis=-1)
        sums = jax.vmap(lambda l, d: jax.ops.segment_sum(
            d, l, num_segments=hw))(flat_lbl, data)
        areas = sums[..., 0]
        sum_x = sums[..., 1]
        survives = roots & (areas >= float(min_area))
        key = jnp.where(survives, -flat_idx, -big)
        top_vals, _ = lax.top_k(key, s_slots)
        sel = -top_vals
        valid = sel < big
        sel_c = jnp.minimum(sel, hw - 1)
        mean_x = (jnp.take_along_axis(sum_x, sel_c, axis=1)
                  / jnp.maximum(jnp.take_along_axis(areas, sel_c, axis=1), 1.0))
        return _order_slots(sel_c, mean_x, valid)

    fast_k = min(fast_k, hw)
    mid_k = min(mid_k, hw)
    n_max = jnp.max(roots.sum(axis=1))
    if mid_k > fast_k:
        sel_sorted, valid_sorted = lax.cond(
            n_max <= fast_k, make_fast_path(fast_k),
            lambda _: lax.cond(n_max <= mid_k, make_fast_path(mid_k),
                               exact_path, operand=None),
            operand=None)
    else:
        sel_sorted, valid_sorted = lax.cond(
            n_max <= fast_k, make_fast_path(fast_k), exact_path, operand=None)

    chans = (lbl2d[:, None] == sel_sorted[:, :, None, None]) & fg2d[:, None]
    return (chans & valid_sorted[:, :, None, None]).astype(jnp.float32)
