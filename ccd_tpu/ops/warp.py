"""Affine grid generation and bilinear grid sampling (torch-semantics parity).

Used to warp glyph-cluster maps from the view-1 frame into the view-2 frame
with the inverse-affine θ recorded by the augmentation pipeline, matching
``F.affine_grid``/``F.grid_sample`` as called in ``Dino/model/dino_vision.py:72-77``
and ``train.py:234-236`` (bilinear, zero padding, align_corners=False).

Arrays are channel-last: input (B, H, W, C), grid (B, H, W, 2) with xy in
[-1, 1]. The sampler is a vectorized 4-tap gather with zero-padding validity
weights — static shapes, no data-dependent control flow.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def affine_grid(theta: jnp.ndarray, size_hw: Tuple[int, int]) -> jnp.ndarray:
    """Generate a (B, H, W, 2) sampling grid from (B, 2, 3) affine matrices.

    align_corners=False convention: base coords are pixel centers
    ``(2i+1)/S - 1``.
    """
    h, w = size_hw
    b = theta.shape[0]
    xs = (2.0 * jnp.arange(w, dtype=theta.dtype) + 1.0) / w - 1.0
    ys = (2.0 * jnp.arange(h, dtype=theta.dtype) + 1.0) / h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)  # (H, W, 3)
    # grid[b, i, j, :] = theta[b] @ [x, y, 1]; tiny contraction — keep fp32
    # precision even on TPU so warp coordinates match the fp32 reference
    grid = jnp.einsum("bkc,hwc->bhwk", theta, base,
                      precision=jax.lax.Precision.HIGHEST)  # (B, H, W, 2)
    return jnp.broadcast_to(grid, (b, h, w, 2))


def homography_grid(h33: jnp.ndarray, size_hw: Tuple[int, int]) -> jnp.ndarray:
    """(B, 3, 3) projective matrices (normalized coords) -> (B, H, W, 2) grid.

    Like :func:`affine_grid` but with the perspective divide, for the
    CVRandomPerspective-style warps (Dino/dataset/transforms.py:198-232).
    """
    h, w = size_hw
    xs = (2.0 * jnp.arange(w, dtype=h33.dtype) + 1.0) / w - 1.0
    ys = (2.0 * jnp.arange(h, dtype=h33.dtype) + 1.0) / h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)
    base = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (H, W, 3)
    mapped = jnp.einsum("bkc,hwc->bhwk", h33, base,
                        precision=jax.lax.Precision.HIGHEST)  # (B, H, W, 3)
    return mapped[..., :2] / jnp.maximum(jnp.abs(mapped[..., 2:3]), 1e-6) * \
        jnp.sign(mapped[..., 2:3])


def grid_sample_binary_packed(bits: jnp.ndarray, grid: jnp.ndarray,
                              n_bits: int, thresh: float = 0.1) -> jnp.ndarray:
    """Warp up to 32 BINARY channels packed into an int32 (B, H, W) bitfield.

    Bit-exact equivalent of ``grid_sample`` over the unpacked one-hot
    channels followed by ``> thresh`` (with binary inputs the bilinear
    output is just the weighted corner-bit sum), but each of the 4 bilinear
    taps gathers ONE int32 channel instead of ``n_bits`` float channels —
    TPU gathers cost ~2.8 ms per (64, 4096, C) tap and scale with C, so
    this cuts the glyph-cluster + mask warp in the pretrain hot loop from
    ~10 ms to ~4 ms. Returns (B, Ho, Wo, n_bits) float {0, 1}.

    For the small 32x128 shapes the gathers are STILL the wrong form (the
    4 int32 taps profiled at ~9 ms/step): unpack-then-dense-contract rides
    the MXU at ~3 ms for the same result, so that path wins whenever
    :func:`grid_sample` itself would go dense.
    """
    b, h, w = bits.shape
    if h * w <= 4096:
        shifts32 = jnp.arange(n_bits, dtype=bits.dtype)
        chans = ((bits[..., None] >> shifts32) & 1).astype(jnp.float32)
        return (grid_sample(chans, grid) > thresh).astype(jnp.float32)
    gx = (grid[..., 0] + 1.0) * w / 2.0 - 0.5
    gy = (grid[..., 1] + 1.0) * h / 2.0 - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = (gx - x0).astype(jnp.float32)
    fy = (gy - y0).astype(jnp.float32)
    flat = bits.reshape(b, h * w)
    shifts = jnp.arange(n_bits, dtype=bits.dtype)

    def tap(yi, xi, wgt):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        packed = jnp.take_along_axis(
            flat, (yi_c * w + xi_c).reshape(b, -1), axis=1
        ).reshape(yi.shape)                                   # (B, Ho, Wo)
        unpacked = ((packed[..., None] >> shifts) & 1).astype(jnp.float32)
        return unpacked * (wgt * valid.astype(jnp.float32))[..., None]

    acc = (tap(y0, x0, (1 - fx) * (1 - fy))
           + tap(y0, x0 + 1, fx * (1 - fy))
           + tap(y0 + 1, x0, (1 - fx) * fy)
           + tap(y0 + 1, x0 + 1, fx * fy))
    return (acc > thresh).astype(jnp.float32)


def grid_sample(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample ``x`` (B, H, W, C) at ``grid`` (B, Ho, Wo, 2).

    Zero padding for out-of-bounds, align_corners=False:
    ``src = (g + 1) * S / 2 - 0.5``.

    Dispatches to the dense-einsum formulation for small images (the 32x128
    text-recognition shapes): TPU gathers cost ~2.2-2.8 ms per 512k indices
    (README op-selection rules) and the two warp call sites in the fused
    pretrain step were 21 ms/step of the 160 ms profile; the einsum path is
    MXU work at ~1-2 ms for the same exact result.
    """
    b, h, w, c = x.shape
    if h * w <= 4096:
        return _grid_sample_dense(x, grid)
    gx = (grid[..., 0] + 1.0) * w / 2.0 - 0.5  # (B, Ho, Wo)
    gy = (grid[..., 1] + 1.0) * h / 2.0 - 0.5

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0

    def tap(yi, xi, wgt):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        # batched gather: (B, Ho, Wo) indices into (B, H, W, C)
        vals = jnp.take_along_axis(
            x.reshape(b, h * w, c),
            (yi_c * w + xi_c).reshape(b, -1, 1),
            axis=1,
        ).reshape(yi.shape + (c,))
        return vals * (wgt * valid.astype(x.dtype))[..., None]

    out = (
        tap(y0, x0, (1 - fx) * (1 - fy))
        + tap(y0, x0 + 1, fx * (1 - fy))
        + tap(y0 + 1, x0, (1 - fx) * fy)
        + tap(y0 + 1, x0 + 1, fx * fy)
    )
    return out


def _grid_sample_dense(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Gather-free bilinear sampling via two dense contractions.

    2-D bilinear interpolation is separable::

        out[b,i,j,c] = sum_y K(sy-y) * sum_x K(sx-x) * img[b,y,x,c]

    with the hat kernel ``K(d) = max(0, 1-|d|)``, which reproduces the 4-tap
    zero-padding sampler EXACTLY (out-of-range source positions get zero
    weight on every pixel; a position within one pixel of the border keeps
    the partial weight of the in-bounds tap). The x-contraction is a
    (B, Ho*Wo, W) x (B, W, H*C) batched matmul — regular MXU work instead
    of a serialized gather stream. fp32 weights + HIGHEST precision keep the
    result at fp32-parity with torch ``F.grid_sample`` (the einsum would
    otherwise drop to bf16 on TPU).
    """
    b, h, w, c = x.shape
    ho, wo = grid.shape[1], grid.shape[2]
    dt = jnp.promote_types(x.dtype, jnp.float32)
    gx = ((grid[..., 0] + 1.0) * w / 2.0 - 0.5).astype(dt)   # (B, Ho, Wo)
    gy = ((grid[..., 1] + 1.0) * h / 2.0 - 0.5).astype(dt)
    kx = jnp.maximum(0.0, 1.0 - jnp.abs(
        gx[..., None] - jnp.arange(w, dtype=dt)))             # (B, Ho, Wo, W)
    ky = jnp.maximum(0.0, 1.0 - jnp.abs(
        gy[..., None] - jnp.arange(h, dtype=dt)))             # (B, Ho, Wo, H)
    # contract x: for every output pixel, blend the two x-neighbor columns
    # of ALL H rows at once -> (B, Ho, Wo, H, C)
    t = jnp.einsum("bijx,byxc->bijyc", kx, x.astype(dt),
                   precision=jax.lax.Precision.HIGHEST)
    # contract y: per-output-pixel 2-tap blend over the H axis
    out = jnp.einsum("bijy,bijyc->bijc", ky, t,
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(x.dtype)
