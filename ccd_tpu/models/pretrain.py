"""CCD pretraining model: student/teacher ViT with char-pooled DINO head.

Parity target: ``ABIDINOModel`` (``Dino/model/dino_vision.py:21-115``). The
module exposes the three compute stages (encode / segment / pool+project) as
separate methods so the training step can interleave the non-differentiable
glyph clustering and θ-warping (ops) between them while keeping everything in
one jitted function. ``__call__`` runs the full student path for init.

Character slots are kept PADDED to (B, 26) with a validity mask (static
shapes for XLA) instead of the reference's ragged boolean indexing
(``dino_vision.py:83-87``); the DINO loss consumes the mask.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ccd_tpu.models.heads import DINOHead, SegHead
from ccd_tpu.models.vit import VIT_ARCHS
from ccd_tpu.ops.pooling import char_attention_pool

Dtype = Any


def char_validity_mask(index: jnp.ndarray, num_slots: int = 26) -> jnp.ndarray:
    """Reference-exact valid-slot mask (dino_vision.py:82-87).

    ``index``: (B, num_slots) bool channel-support mask from pooling of the
    *source-view* clusters. length = clamp(#nonzero, 3, 26); slots with
    position <= length are kept (note the reference's ``<=`` keeps length+1
    slots, reproduced as-is).
    """
    length = jnp.clip(index.sum(axis=1), 3, num_slots)[:, None]
    grid = jnp.arange(num_slots)[None, :]
    return grid <= length


class CCDPretrainModel(nn.Module):
    arch: str = "vit_small"
    patch_size: int = 4
    drop_path_rate: float = 0.0
    out_dim: int = 65536
    use_bn_in_head: bool = False
    norm_last_layer: bool = True
    with_seg_head: bool = True   # student has a SegHead; teacher does not
    num_slots: int = 26
    remat: bool = False          # rematerialize ViT blocks (bigger batches)
    dtype: Dtype = jnp.float32

    def setup(self):
        self.backbone = VIT_ARCHS[self.arch](
            patch_size=self.patch_size, drop_path_rate=self.drop_path_rate,
            remat=self.remat, dtype=self.dtype, name="backbone")
        if self.with_seg_head:
            self.segmentation = SegHead(mla_channels=128, mlahead_channels=64,
                                        num_classes=2, dtype=self.dtype,
                                        name="segmentation")
        self.head = DINOHead(self.out_dim, use_bn=self.use_bn_in_head,
                             norm_last_layer=self.norm_last_layer,
                             dtype=self.dtype, name="head")

    # ------------------------------------------------------------ stages
    def encode(self, images, train: bool = False):
        """images (N, H, W, 3) -> (region_f (N, gh, gw, E), taps)."""
        n, h, w, _ = images.shape
        tokens, taps = self.backbone(images, deterministic=not train)
        gh, gw = h // self.patch_size, w // self.patch_size
        region_f = tokens.reshape(n, gh, gw, tokens.shape[-1])
        return region_f, taps

    def segment(self, taps, train: bool = False):
        """3 taps -> (N, H, W, 2) text/background logits."""
        return self.segmentation(taps, train=train)

    def pool_project(self, region_f, clusters, train: bool = False,
                     flat: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Char-pool features with cluster maps and project through DINOHead.

        region_f: (N, gh, gw, E); clusters: (N, T, H, W).
        Returns (logits, index (N, T) channel-support bool).

        ``flat``: collapse (N, T) BEFORE the out_dim projection and return
        logits as (N*T, out_dim) view-stacked rows. T=26 is not a multiple
        of the 8-sublane tile, so flattening the (N, T, 65536) head OUTPUT
        is a full relayout copy (~4.6 ms/step measured); flattening the
        (N, T, 256) head INPUT is ~3 MB and free. The fused CE kernel
        consumes these rows directly.
        """
        attn_vecs, index = self.pool(region_f, clusters)
        if flat:
            attn_vecs = attn_vecs.reshape(-1, attn_vecs.shape[-1])
        logits = self.project(attn_vecs, train=train)
        return logits, index

    def pool(self, region_f, clusters) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Char-pooling alone: (N, gh, gw, E) x (N, T, H, W) ->
        ((N, T, E) char vectors, (N, T) channel-support bool). Split out from
        :meth:`pool_project` so the sharded train step can place a sharding
        constraint on the SMALL (·, E) pooled features (a ~3 MB resharding
        point) before the 65536-wide head matmul — see
        ``make_pretrain_step(mesh=...)``."""
        return char_attention_pool(region_f, clusters)

    def project(self, attn_vecs, train: bool = False) -> jnp.ndarray:
        """DINOHead projection over the last axis; any leading shape."""
        return self.head(attn_vecs, train=train)

    # ------------------------------------------------------------ init path
    def __call__(self, images, clusters: Optional[jnp.ndarray] = None,
                 train: bool = False):
        """Full student path (touches every parameter; used for init/tests)."""
        region_f, taps = self.encode(images, train=train)
        seg_logits = self.segment(taps, train=train) if self.with_seg_head else None
        if clusters is None:
            n, h, w, _ = images.shape
            clusters = jnp.zeros((n, self.num_slots, h, w), self.dtype)
        logits, index = self.pool_project(region_f, clusters, train=train)
        return {"instances_view": logits, "mask": seg_logits, "index": index,
                "feature": region_f}
