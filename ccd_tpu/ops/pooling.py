"""Character attention pooling: cluster-mask-weighted token averaging.

Parity target: ``ABIDINOModel.attention`` (``Dino/model/dino_vision.py:38-49``):
bilinear-resize (B, T, H, W) cluster channels to the token grid, normalize
each channel to sum 1 (NaN -> 0 for empty channels), and matmul against the
token features to pool up to T per-character vectors.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ccd_tpu.ops.image import resize_bilinear


def char_attention_pool(features: jnp.ndarray, clusters: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pool per-character features from the token grid.

    Args:
      features: (B, h, w, E) token features on the patch grid (NHWC).
      clusters: (B, T, H, W) glyph-cluster channel masks (any H, W).
    Returns:
      attn_vecs: (B, T, E) pooled character vectors.
      index: (B, T) bool — channel has nonzero support after resizing.
    """
    b, h, w, e = features.shape
    t = clusters.shape[1]
    clusters = resize_bilinear(clusters, (h, w), channel_last=False)  # (B, T, h, w)
    flat = clusters.reshape(b, t, h * w)
    sums = flat.sum(-1)  # (B, T)
    weights = jnp.where(sums[..., None] > 0, flat / jnp.maximum(sums[..., None], 1e-12), 0.0)
    attn_vecs = jnp.einsum("btn,bne->bte", weights, features.reshape(b, h * w, e))
    return attn_vecs, sums > 0
