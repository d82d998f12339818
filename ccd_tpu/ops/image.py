"""Separable matrix-based image resizing (TPU-native: resampling as matmuls).

Instead of gather-based interpolation (poor fit for the VPU), resizes are
expressed as two small dense interpolation-weight matrices applied over H and
W — MXU-friendly einsums with statically-known shapes.

Semantics parity:
  * :func:`resize_bilinear` — half-pixel centers with edge clamp; matches
    ``cv2.resize(INTER_LINEAR)`` and ``torch.nn.functional.interpolate(mode=
    'bilinear', align_corners=False)`` (no antialiasing, like both).
  * :func:`resize_bicubic` — cubic kernel with a=-0.75 (torch/OpenCV
    convention; NOT jax.image's Keys a=-0.5), half-pixel centers, edge clamp;
    matches ``F.interpolate(mode='bicubic', align_corners=False)``. The
    optional ``scale`` argument reproduces torch's behavior when a
    ``scale_factor`` is passed explicitly (coordinate mapping uses the given
    scale, not out/in) — required for parity with the reference ViT
    pos-embedding interpolation (``Dino/modules/vision_transformer.py:182-201``
    passes ``scale_factor=(w0+0.1)/sqrt(N)``).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# interpolation weights are tiny; always contract them at full precision so
# results match the fp32 reference semantics even on TPU (where the default
# matmul precision is bf16)
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def _cubic_weight(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), torch/OpenCV coefficient a=-0.75."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax ** 3 - (a + 3.0) * ax ** 2 + 1.0,
        np.where(ax < 2.0, a * ax ** 3 - 5.0 * a * ax ** 2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@lru_cache(maxsize=256)
def _resize_matrix(in_size: int, out_size: int, method: str,
                   scale: Optional[float] = None) -> np.ndarray:
    """(out_size, in_size) row-stochastic interpolation matrix."""
    if scale is None:
        scale = out_size / in_size
    # half-pixel (align_corners=False) source coordinates
    src = (np.arange(out_size) + 0.5) / scale - 0.5
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if method == "linear":
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        for k, w in ((i0, 1.0 - frac), (i0 + 1, frac)):
            kc = np.clip(k, 0, in_size - 1)
            np.add.at(mat, (np.arange(out_size), kc), w)
    elif method == "cubic":
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        for tap in range(-1, 3):
            w = _cubic_weight(frac - tap)
            kc = np.clip(i0 + tap, 0, in_size - 1)
            np.add.at(mat, (np.arange(out_size), kc), w)
    else:
        raise ValueError(f"unknown resize method {method!r}")
    return mat.astype(np.float32)


def _apply_separable(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray) -> jnp.ndarray:
    """Apply (Ho,Hi)/(Wo,Wi) matrices over the last-two-but-channel dims.

    Accepts (..., H, W) or (..., H, W, C); resizes over the H/W axes.
    """
    mh = jnp.asarray(mh, dtype=x.dtype)
    mw = jnp.asarray(mw, dtype=x.dtype)
    if x.ndim >= 3:
        # assume channel-last (..., H, W, C)
        y = _einsum("oh,...hwc->...owc", mh, x)
        y = _einsum("pw,...owc->...opc", mw, y)
        return y
    y = _einsum("oh,hw->ow", mh, x)
    y = _einsum("pw,ow->op", mw, y)
    return y


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int],
                    channel_last: bool = True) -> jnp.ndarray:
    """Bilinear resize, half-pixel centers, edge clamp, no antialias.

    ``x``: (..., H, W, C) if channel_last else (..., H, W).
    """
    if channel_last and x.ndim >= 3:
        in_h, in_w = x.shape[-3], x.shape[-2]
    else:
        in_h, in_w = x.shape[-2], x.shape[-1]
    mh = _resize_matrix(in_h, out_hw[0], "linear")
    mw = _resize_matrix(in_w, out_hw[1], "linear")
    if channel_last and x.ndim >= 3:
        return _apply_separable(x, mh, mw)
    # (..., H, W): broadcast matmuls
    mhj = jnp.asarray(mh, dtype=x.dtype)
    mwj = jnp.asarray(mw, dtype=x.dtype)
    y = _einsum("oh,...hw->...ow", mhj, x)
    return _einsum("pw,...ow->...op", mwj, y)


def resize_bicubic(x: jnp.ndarray, out_hw: Tuple[int, int],
                   scale: Optional[Sequence[float]] = None,
                   channel_last: bool = True) -> jnp.ndarray:
    """Bicubic (a=-0.75) resize matching torch ``interpolate(mode='bicubic')``.

    ``scale``: optional (scale_h, scale_w) to use for the coordinate mapping
    (torch ``scale_factor`` semantics); defaults to out/in.
    """
    if channel_last and x.ndim >= 3:
        in_h, in_w = x.shape[-3], x.shape[-2]
    else:
        in_h, in_w = x.shape[-2], x.shape[-1]
    sh = float(scale[0]) if scale is not None else None
    sw = float(scale[1]) if scale is not None else None
    mh = _resize_matrix(in_h, out_hw[0], "cubic", sh)
    mw = _resize_matrix(in_w, out_hw[1], "cubic", sw)
    if channel_last and x.ndim >= 3:
        return _apply_separable(x, mh, mw)
    mhj = jnp.asarray(mh, dtype=x.dtype)
    mwj = jnp.asarray(mw, dtype=x.dtype)
    y = _einsum("oh,...hw->...ow", mhj, x)
    return _einsum("pw,...ow->...op", mwj, y)
