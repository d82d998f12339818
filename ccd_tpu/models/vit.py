"""Vision Transformer backbone for 32x128 scene-text images.

Parity target: ``Dino/modules/vision_transformer.py`` — a DINO/timm-style ViT
adapted for text: rectangular patch grid (patch 4 -> 8x32 = 256 tokens), NO
CLS token, bicubic pos-embed resampling (the reference stores the table on a
16x16 grid and always resamples it to the 8x32 text grid with
``scale_factor=((gh+0.1)/16, (gw+0.1)/16)`` — reproduced exactly for
checkpoint parity), stochastic depth, and LayerNormed intermediate feature
taps at blocks ``out_indices`` reshaped to the 2-D grid for the seg head.

TPU-first choices: NHWC layout throughout, fp32 params with a configurable
compute dtype (bf16 on TPU), exact (erf) GELU matching torch, fp32 softmax.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ccd_tpu.ops.activations import gelu as _gelu
from ccd_tpu.ops.image import resize_bicubic

Dtype = Any

_dense_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


class DropPath(nn.Module):
    """Per-sample stochastic depth (``drop_path`` in the reference)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return x / keep * mask.astype(x.dtype)


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, kernel_init=_dense_init, dtype=self.dtype,
                     name="fc1")(x)
        x = _gelu(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, kernel_init=_dense_init, dtype=self.dtype,
                     name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class _QKVDense(nn.Module):
    """``nn.Dense`` twin that returns ``(x @ kernel, bias)`` WITHOUT adding
    the bias. The packed attention kernel adds it inside VMEM — XLA cannot
    fuse a bias add into an opaque ``pallas_call``, so adding it on the
    graph costs a full (B, N, 3C) HBM round-trip (~4 ms/step in the ViT-S
    pretrain profile). Parameter tree and initialization are identical to
    ``nn.Dense(name="qkv")`` for checkpoint/converter parity."""

    features: int
    use_bias: bool
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", _dense_init,
                            (x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros_init(),
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        return x @ kernel, bias


class Attention(nn.Module):
    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_flash: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, need_weights: bool = False):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        qkv, qkv_bias = _QKVDense(self.dim * 3, use_bias=self.qkv_bias,
                                  dtype=self.dtype, name="qkv")(x)

        # fused Pallas path: the (B,H,N,N) probabilities never touch HBM.
        # Exactly equivalent when attention dropout is inactive and the
        # weights aren't requested (ViT configs use attn_drop=0). The packed
        # kernel consumes the raw Dense output (B,N,3C) and emits (B,N,C) —
        # no physical (B,N,H,D)<->(B*H,N,D) transposes (~15 ms/step of the
        # ViT-S pretrain profile; transposes move at ~1/3 of copy bandwidth).
        flash_ok = (self.use_flash and not need_weights
                    and (self.attn_drop == 0.0 or deterministic)
                    and jax.default_backend() == "tpu")
        if flash_ok:
            from ccd_tpu.ops.flash_attention import (mha_packed,
                                                     mha_packed_bias)
            if qkv_bias is None:
                out = mha_packed(qkv, scale, self.num_heads)  # (B, N, C)
            else:
                out = mha_packed_bias(qkv, qkv_bias, scale, self.num_heads)
            attn = None
        else:
            if qkv_bias is not None:
                qkv = qkv + qkv_bias
            qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, c)
        out = nn.Dense(self.dim, kernel_init=_dense_init, dtype=self.dtype,
                       name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out, attn


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    ln_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_attention: bool = False):
        y, attn = Attention(self.dim, self.num_heads, self.qkv_bias, self.attn_drop,
                            self.drop, dtype=self.dtype, name="attn")(
            nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x),
            deterministic=deterministic, need_weights=return_attention)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, deterministic)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.drop, dtype=self.dtype,
                name="mlp")(
            nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(x),
            deterministic=deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)
        if return_attention:
            return x, attn
        return x


class PatchEmbed(nn.Module):
    patch_size: int = 4
    embed_dim: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C) NHWC
        p = self.patch_size
        x = nn.Conv(self.embed_dim, kernel_size=(p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="proj")(x)
        b, gh, gw, e = x.shape
        return x.reshape(b, gh * gw, e)


class VisionTransformer(nn.Module):
    """No-CLS rectangular-grid ViT with intermediate seg-feature taps."""

    img_size: Tuple[int, int] = (32, 128)
    patch_size: int = 4
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    out_indices: Sequence[int] = (2, 4, 6)
    ln_eps: float = 1e-6
    remat: bool = False  # rematerialize each block (trade FLOPs for HBM)
    dtype: Dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.img_size[0] // self.patch_size) * (self.img_size[1] // self.patch_size)

    def setup(self):
        self.patch_embed = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype)
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0),
            (1, self.num_patches, self.embed_dim))
        self.pos_drop = nn.Dropout(self.drop_rate)
        # numpy (not jnp): setup re-runs under tracing and these must stay static
        import numpy as np
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, self.depth)]
        # remat: recompute block activations in the backward pass instead of
        # keeping them in HBM — unlocks 2-4x larger per-chip batches for the
        # memory-bound pretrain step (the 65536-dim heads dominate HBM).
        # `deterministic` is a Python-level branch (DropPath), so it must be
        # static under the checkpoint transform (self is argnum 0).
        block_cls = (nn.remat(Block, prevent_cse=False, static_argnums=(2,))
                     if self.remat else Block)
        self.blocks = [
            block_cls(self.embed_dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
                      self.drop_rate, self.attn_drop_rate, dpr[i], self.ln_eps,
                      dtype=self.dtype, name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype)
        # one LayerNorm per tapped block (reference `norm_seg` Sequential of 3)
        self.norm_seg = [
            nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name=f"norm_seg_{i}")
            for i in range(len(self.out_indices))
        ]

    def _interpolate_pos_encoding(self, npatch: int, h_img: int, w_img: int) -> jnp.ndarray:
        """Reference-exact pos-embed resampling (vision_transformer.py:182-201).

        The (1, N, E) table is viewed as a sqrt(N) x sqrt(N) grid and
        bicubic-resampled to the actual patch grid with torch's
        scale_factor=( (gh+0.1)/s, (gw+0.1)/s ) coordinate mapping. Skipped
        only when npatch == N AND the image is square.
        """
        n = self.pos_embed.shape[1]
        if npatch == n and h_img == w_img:
            return self.pos_embed
        gh = h_img // self.patch_size
        gw = w_img // self.patch_size
        s = int(math.sqrt(n))
        grid = self.pos_embed.reshape(1, s, s, self.embed_dim)
        out = resize_bicubic(grid, (gh, gw), scale=((gh + 0.1) / s, (gw + 0.1) / s))
        assert out.shape[1] == gh and out.shape[2] == gw
        return out.reshape(1, gh * gw, self.embed_dim)

    def prepare_tokens(self, x, deterministic: bool = True):
        b, h, w, _ = x.shape
        tokens = self.patch_embed(x)
        tokens = tokens + self._interpolate_pos_encoding(tokens.shape[1], h, w).astype(tokens.dtype)
        return self.pos_drop(tokens, deterministic=deterministic)

    def __call__(self, x, deterministic: bool = True):
        """x: (B, H, W, 3) NHWC -> (tokens (B, N, E), [3x (B, gh, gw, E) taps])."""
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        tokens = self.prepare_tokens(x, deterministic)
        taps = []
        j = 0
        for index, blk in enumerate(self.blocks):
            tokens = blk(tokens, deterministic)  # positional: remat static arg
            if index + 1 in self.out_indices:
                tap = self.norm_seg[j](tokens)
                taps.append(tap.reshape(b, gh, gw, self.embed_dim))
                j += 1
        tokens = self.norm(tokens)
        return tokens, taps

    def get_last_selfattention(self, x):
        tokens = self.prepare_tokens(x, deterministic=True)
        for i, blk in enumerate(self.blocks):
            if i < len(self.blocks) - 1:
                tokens = blk(tokens, deterministic=True)
            else:
                _, attn = blk(tokens, deterministic=True, return_attention=True)
                return attn
        return None


# reference variants (vision_transformer.py:273-291) — note the non-standard
# 512-dim / 8-head "base"
vit_micro = partial(VisionTransformer, embed_dim=64, depth=3, num_heads=2,
                    mlp_ratio=4.0, qkv_bias=True,
                    out_indices=(1, 2, 3))  # test/dry-run scale only
vit_tiny = partial(VisionTransformer, embed_dim=192, depth=12, num_heads=3,
                   mlp_ratio=4.0, qkv_bias=True)
vit_small = partial(VisionTransformer, embed_dim=384, depth=12, num_heads=6,
                    mlp_ratio=4.0, qkv_bias=True)
vit_base = partial(VisionTransformer, embed_dim=512, depth=12, num_heads=8,
                   mlp_ratio=4.0, qkv_bias=True)

VIT_ARCHS = {"vit_micro": vit_micro, "vit_tiny": vit_tiny,
             "vit_small": vit_small, "vit_base": vit_base}
