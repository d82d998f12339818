"""Projection and segmentation heads.

Parity targets:
  * ``DINOHead`` — ``Dino/modules/vision_transformer.py:294-328``: 3-layer MLP
    (hidden 2048 -> bottleneck 256) -> L2 normalize -> weight-normed linear to
    ``out_dim`` (65536), with the weight-norm gain ``g`` frozen at 1 when
    ``norm_last_layer``.
  * ``SegHead`` — ``Dino/modules/segmentor.py:37-95``: three per-level conv
    branches over the tapped ViT maps, concat to 192ch, two ConvTranspose 4x4
    stride-2 upsamplings (8x32 -> 32x128), 3x3 conv to 2-class text/background
    logits. BatchNorm statistics are computed over the *global* (sharded)
    batch under pjit — the TPU equivalent of the reference's SyncBatchNorm.
  * ``MlpEncoder`` — the finetune ``Mlp`` encoder (``Dino/model/dino_vision.py:117-133``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ccd_tpu.ops.activations import gelu as _gelu
from jax import lax

Dtype = Any

_dense_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)




class DINOHead(nn.Module):
    out_dim: int
    use_bn: bool = False
    norm_last_layer: bool = True
    nlayers: int = 3
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nlayers = max(self.nlayers, 1)
        if nlayers == 1:
            x = nn.Dense(self.bottleneck_dim, kernel_init=_dense_init,
                         dtype=self.dtype, name="mlp_0")(x)
        else:
            x = nn.Dense(self.hidden_dim, kernel_init=_dense_init, dtype=self.dtype,
                         name="mlp_0")(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype, name="bn_0")(x)
            x = _gelu(x)
            for i in range(nlayers - 2):
                x = nn.Dense(self.hidden_dim, kernel_init=_dense_init, dtype=self.dtype,
                             name=f"mlp_{i + 1}")(x)
                if self.use_bn:
                    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                     epsilon=1e-5, dtype=self.dtype, name=f"bn_{i + 1}")(x)
                x = _gelu(x)
            x = nn.Dense(self.bottleneck_dim, kernel_init=_dense_init, dtype=self.dtype,
                         name=f"mlp_{nlayers - 1}")(x)

        # L2 normalize (torch F.normalize: eps=1e-12 on the norm). The clamp
        # sits INSIDE the sqrt: empty char slots pool to all-zero vectors and
        # sqrt'(0) = inf would turn their (masked-out) cotangents into NaNs.
        sumsq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        norm = jnp.sqrt(jnp.maximum(sumsq, 1e-24))
        x = x / norm.astype(x.dtype)

        # weight-normed final linear (no bias): w = g * v / ||v||
        v = self.param("last_layer_v", _dense_init, (self.bottleneck_dim, self.out_dim))
        g = self.param("last_layer_g", nn.initializers.ones, (1, self.out_dim))
        if self.norm_last_layer:
            g = lax.stop_gradient(g)  # reference freezes weight_g at 1
        v_norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        w = (v * (g / jnp.maximum(v_norm, 1e-12))).astype(self.dtype)
        return x @ w


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d(k=4, s=2, p=1) with torch semantics (exact 2x upsample).

    Implemented as a dilated convolution: zero-stuff the input (lhs_dilation
    2), pad by k-1-p = 2, convolve with the spatially-flipped kernel.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.variance_scaling(
            1 / 3, "fan_in", "uniform"), (4, 4, in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = lax.conv_general_dilated(
            x.astype(self.dtype), jnp.flip(kernel, (0, 1)).astype(self.dtype),
            window_strides=(1, 1), padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(self.dtype)


class _MLABranch(nn.Module):
    mla_channels: int
    mlahead_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.mla_channels, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.mlahead_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn2")(x)
        return nn.relu(x)


class SegHead(nn.Module):
    mla_channels: int = 128
    mlahead_channels: int = 64
    num_classes: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, taps, train: bool = False):
        """taps: 3x (B, gh, gw, E) -> (B, 4*gh, 4*gw, num_classes) logits."""
        heads = [
            _MLABranch(self.mla_channels, self.mlahead_channels, dtype=self.dtype,
                       name=f"head{i + 2}")(taps[i], train=train)
            for i in range(3)
        ]
        x = jnp.concatenate(heads, axis=-1)  # (B, gh, gw, 192)
        x = TorchConvTranspose(128, dtype=self.dtype, name="unpool1_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="unpool1_bn")(x)
        x = nn.relu(x)
        x = TorchConvTranspose(128, dtype=self.dtype, name="unpool2_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="unpool2_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="cls")(x)
        return x


class MlpEncoder(nn.Module):
    """Finetune encoder: Mlp(embed_dim -> 512 -> 512, GELU, dropout 0.1)."""

    hidden_features: int = 512
    out_features: int = 512
    drop: float = 0.1
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
