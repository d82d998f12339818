"""Batched, device-side augmentation (replaces the imgaug CPU pipelines).

The reference burns DataLoader-worker CPU on per-sample imgaug chains
(``Dino/dataset/augmentation_pipelines.py`` severity-5 photometrics and the
per-view ``iaa.Affine`` with recorded θ, ``datasetsupervised_kmeans.py:48-87``).
Here the whole batch is augmented on device in one jitted, seeded function —
elementwise VPU work XLA fuses for free — and the θ-matrix bookkeeping is
exact: θ is the normalized inverse affine mapping view-2 grid coordinates
back to the source frame, the same matrix fed to ``affine_grid``/
``grid_sample`` downstream (``dino_vision.py:72-77``).

The pipelines replicate the reference STRUCTURE exactly — the same
Sometimes/OneOf tree with the same probabilities, and an op-for-op device
equivalent of every imgaug op (``ccd_tpu/data/aug_ops.py``; the few
documented approximations are listed in PARITY.md):

* ``photometric_augment``  = severity-5 chain,
  ``augmentation_pipelines.py:122-208``: Sometimes(0.2, Identity,
  Sequential[arithmetic(OneOf-21), Sometimes(.7) color(OneOf-9),
  Sometimes(.7) blur, Sometimes(.7) contrast(OneOf-8),
  Sometimes(.7) weather(OneOf-4)])
* ``supervised_augment``   = staged finetune chain,
  ``dataset_pretrain.py:80-160`` (ViT-Small probabilities
  [0.6, 0.8, 0.6, 0.6, 0.6])
* ``abinet_augment``       = the use_abi CV family,
  ``Dino/dataset/transforms.py:307-366``
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ccd_tpu.ops.warp import affine_grid, grid_sample

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize(images: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) float [0,1] -> ImageNet-normalized."""
    return (images - IMAGENET_MEAN) / IMAGENET_STD


def denormalize(images: jnp.ndarray) -> jnp.ndarray:
    return images * IMAGENET_STD + IMAGENET_MEAN


def _per_sample(rng, b, lo, hi):
    return jax.random.uniform(rng, (b, 1, 1, 1), minval=lo, maxval=hi)


def _gate(rng, b, p):
    return jax.random.bernoulli(rng, p, (b, 1, 1, 1)).astype(jnp.float32)


def _blend(x, y, gate):
    return x * (1.0 - gate) + y * gate


def _motion_blur(x: jnp.ndarray, rng, strength: float) -> jnp.ndarray:
    """Random-direction 5-tap line blur (approximates iaa.MotionBlur)."""
    b, h, w, c = x.shape
    horiz = jax.random.bernoulli(rng, 0.5, (b, 1, 1, 1)).astype(x.dtype)
    xp_h = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (0, 0)), mode="edge")
    blur_h = sum(xp_h[:, :, i:i + w] for i in range(5)) / 5.0
    xp_v = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)), mode="edge")
    blur_v = sum(xp_v[:, i:i + h] for i in range(5)) / 5.0
    blurred = horiz * blur_h + (1.0 - horiz) * blur_v
    return x * (1.0 - strength) + blurred * strength


def photometric_augment(rng: jnp.ndarray, images: jnp.ndarray,
                        severity: int = 5) -> jnp.ndarray:
    """``get_augmentation_pipeline(severity)`` on (B, H, W, 3) float [0,1]
    images — ALL six severities ported chain-for-chain
    (``augmentation_pipelines.py:4-235``); severity 5 (the pretrain default)::

        Sometimes(0.2, Identity, Sequential[
            OneOf(21 arithmetic ops),            # always applied
            Sometimes(0.7, OneOf(9 color ops)),
            Sometimes(0.7, OneOf[Sharpen, OneOf(5 blurs)]),
            Sometimes(0.7, OneOf(8 contrast ops)),
            Sometimes(0.7, OneOf(4 weather ops)),
        ])
    """
    from ccd_tpu.data import aug_ops as A
    if severity == 1:
        return _severity_1_3(rng, images, invert_p=0.5)
    if severity == 2:
        return _severity_2(rng, images)
    if severity == 3:
        return _severity_1_3(rng, images, invert_p=0.1)
    if severity == 4:
        return _severity_4(rng, images)
    if severity == 6:
        return _severity_6(rng, images)
    if severity != 5:
        raise NotImplementedError(
            f"augmentation_severity={severity} is not supported")
    b = images.shape[0]
    keys = jax.random.split(rng, 6)
    x = images
    x = A.one_of(keys[0], x, A.ARITHMETIC_OPS)
    x = A.sometimes(keys[1], x, 0.7, lambda k, y: A.one_of(k, y, A.COLOR_OPS))
    x = A.sometimes(keys[2], x, 0.7, A.blur_family)
    x = A.sometimes(keys[3], x, 0.7,
                    lambda k, y: A.one_of(k, y, A.CONTRAST_OPS))
    x = A.sometimes(keys[4], x, 0.7,
                    lambda k, y: A.one_of(k, y, A.WEATHER_OPS))
    # iaa.Sometimes(0.2, Identity, <chain>): 20% keep the original
    keep = _gate(keys[5], b, 0.2)
    return _blend(x, images, keep)


def _severity_1_3(rng: jnp.ndarray, images: jnp.ndarray,
                  invert_p: float) -> jnp.ndarray:
    """Severities 1 and 3 (identical but for Invert's p: 0.5 vs 0.1) —
    ``augmentation_pipelines.py:10-39, 53-81``: Sequential[Invert,
    OneOf(9 color), OneOf[Sharpen, OneOf(4 blurs)], OneOf(4 noise)]."""
    from ccd_tpu.data import aug_ops as A
    keys = jax.random.split(rng, 4)
    color_ops = [
        lambda k, y: A.op_channel_shuffle(k, y, p=0.35),
        A.op_grayscale,
        A.op_kmeans_color_quantization,
        A.op_histogram_equalization,
        lambda k, y: A.op_dropout(k, y, p_max=0.2),
        A.op_gamma_contrast,
        A.op_multiply_brightness,
        A.op_add_hue_saturation,
        A.op_change_color_temperature,
    ]
    noise_ops = [
        A.op_emboss,
        A.op_additive_gaussian,
        A.op_impulse_noise,
        lambda k, y: A.op_multiply_elementwise(k, y, p_per_channel=0.0),
    ]
    x = A.op_invert(keys[0], images, p=invert_p)
    x = A.one_of(keys[1], x, color_ops)
    x = A.blur_family(keys[2], x, kinds=A.BLUR_KINDS)  # no BilateralBlur
    x = A.one_of(keys[3], x, noise_ops)
    return x


def _severity_2(rng: jnp.ndarray, images: jnp.ndarray) -> jnp.ndarray:
    """Severity 2 — ``augmentation_pipelines.py:40-51``:
    SomeOf((1, None), [LinearContrast, GaussianBlur, Crop(top/bottom 0-40%),
    Crop(left/right 0-2%), Sharpen, ElasticTransformation(0-0.8, 0.25),
    PerspectiveTransform(0.01-0.02)], random_order=True)."""
    from ccd_tpu.data import aug_ops as A
    ops = [
        A.op_linear_contrast,
        A.op_gaussian_blur,
        lambda k, y: _op_crop(k, y, tb=(0.0, 0.4), lr=(0.0, 0.0)),
        lambda k, y: _op_crop(k, y, tb=(0.0, 0.0), lr=(0.0, 0.02)),
        A.op_sharpen,
        _op_elastic,
        _op_perspective,
    ]
    return A.some_of_random_order(rng, images, ops)


def _severity_4(rng: jnp.ndarray, images: jnp.ndarray) -> jnp.ndarray:
    """Severity 4 — ``augmentation_pipelines.py:83-121``: Sometimes(0.2,
    Identity, Sequential[Sometimes(0.3, Invert(0.1)), Sometimes(0.6,
    OneOf(11 color)), Sometimes(0.6, blur family), Sometimes(0.6,
    OneOf(5 noise))])."""
    from ccd_tpu.data import aug_ops as A
    keys = jax.random.split(rng, 5)
    color_ops = [
        lambda k, y: A.op_channel_shuffle(k, y, p=0.35),
        A.op_grayscale,
        A.op_kmeans_color_quantization,
        A.op_histogram_equalization,
        A.op_clahe,
        lambda k, y: A.op_dropout(k, y, p_max=0.1),
        A.op_gamma_contrast,
        A.op_linear_contrast,
        A.op_multiply_brightness,
        A.op_add_hue_saturation,
        A.op_change_color_temperature,
    ]
    noise_ops = [
        A.op_emboss,
        lambda k, y: A.op_additive_gaussian(k, y, scale_max=0.1),
        lambda k, y: A.op_impulse_noise(k, y, p=0.05),
        lambda k, y: A.op_multiply_elementwise(k, y, p_per_channel=0.0),
        lambda k, y: A.op_coarse_dropout(k, y, p=0.02, size_percent=0.5,
                                         per_channel=0.0),
    ]
    x = A.sometimes(keys[0], images, 0.3,
                    lambda k, y: A.op_invert(k, y, p=0.1))
    x = A.sometimes(keys[1], x, 0.6, lambda k, y: A.one_of(k, y, color_ops))
    x = A.sometimes(keys[2], x, 0.6,
                    lambda k, y: A.blur_family(k, y, kinds=A.BLUR_KINDS))
    x = A.sometimes(keys[3], x, 0.6, lambda k, y: A.one_of(k, y, noise_ops))
    keep = _gate(keys[4], images.shape[0], 0.2)
    return _blend(x, images, keep)


def _severity_6(rng: jnp.ndarray, images: jnp.ndarray) -> jnp.ndarray:
    """Severity 6 — ``augmentation_pipelines.py:210-232``: a flat
    OneOf(17 color/contrast ops)."""
    from ccd_tpu.data import aug_ops as A
    ops = [
        A.op_hue_add,
        A.op_multiply_and_add_to_brightness,
        A.op_multiply_hue_saturation,
        A.op_hue_add_strong,
        A.op_uniform_color_quantization,
        lambda k, y: A.op_channel_shuffle(k, y, p=0.35),
        A.op_grayscale,
        A.op_kmeans_color_quantization,
        A.op_histogram_equalization,
        lambda k, y: A.op_dropout(k, y, p_max=0.2),
        A.op_gamma_contrast,
        A.op_multiply_brightness,
        A.op_add_hue_saturation,
        A.op_change_color_temperature,
        A.op_sharpen,
        A.op_clahe,
        A.op_linear_contrast,
    ]
    return A.one_of(rng, images, ops)


def _op_crop(key: jnp.ndarray, x: jnp.ndarray, tb=(0.0, 0.4),
             lr=(0.0, 0.0)) -> jnp.ndarray:
    """iaa.Crop(percent=..., keep_size=True): per-side integer-pixel crop +
    resize back, realized as one bilinear grid_sample of the crop rectangle
    (imgaug crops then cv2-resizes; same geometry, one resample)."""
    b, h, w, _ = x.shape
    k = jax.random.split(key, 4)
    top = jnp.floor(jax.random.uniform(k[0], (b,), minval=tb[0],
                                       maxval=tb[1]) * h)
    bottom = jnp.floor(jax.random.uniform(k[1], (b,), minval=tb[0],
                                          maxval=tb[1]) * h)
    left = jnp.floor(jax.random.uniform(k[2], (b,), minval=lr[0],
                                        maxval=lr[1]) * w)
    right = jnp.floor(jax.random.uniform(k[3], (b,), minval=lr[0],
                                         maxval=lr[1]) * w)
    # in align_corners=False normalized coords the crop is the affine map
    # src = s * out + t with s = (dim - a - b)/dim, t = (a - b)/dim
    sy = (h - top - bottom) / h
    ty = (top - bottom) / h
    sx = (w - left - right) / w
    tx = (left - right) / w
    zeros = jnp.zeros_like(sx)
    theta = jnp.stack([
        jnp.stack([sx, zeros, tx], axis=-1),
        jnp.stack([zeros, sy, ty], axis=-1),
    ], axis=-2)
    return grid_sample(x, affine_grid(theta, (h, w)))


def _op_elastic(key: jnp.ndarray, x: jnp.ndarray, alpha=(0.0, 0.8),
                sigma: float = 0.25) -> jnp.ndarray:
    """iaa.ElasticTransformation(alpha=(0, 0.8), sigma=0.25): per-pixel
    U(-1,1) displacement fields smoothed by a gaussian of the given sigma
    (3-tap separable at sigma 0.25), scaled by alpha pixels, applied as a
    sub-pixel warp."""
    b, h, w, _ = x.shape
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.uniform(k1, (b, 1, 1, 1), minval=alpha[0], maxval=alpha[1])
    disp = jax.random.uniform(k2, (b, h, w, 2), minval=-1.0, maxval=1.0)
    wts = np.exp(-np.array([1.0, 0.0, 1.0]) / (2.0 * sigma * sigma))
    wts = (wts / wts.sum()).astype(np.float32)

    def blur1d(d, axis):
        pad = [(0, 0)] * 4
        pad[axis] = (1, 1)
        dp = jnp.pad(d, pad, mode="edge")
        n = d.shape[axis]
        sl = [slice(None)] * 4
        out = 0.0
        for t in range(3):
            s = list(sl)
            s[axis] = slice(t, t + n)
            out = out + wts[t] * dp[tuple(s)]
        return out

    disp = blur1d(blur1d(disp, 1), 2) * a
    del k3
    xs = (2.0 * jnp.arange(w, dtype=jnp.float32) + 1.0) / w - 1.0
    ys = (2.0 * jnp.arange(h, dtype=jnp.float32) + 1.0) / h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)
    base = jnp.broadcast_to(jnp.stack([gx, gy], -1), (b, h, w, 2))
    scale = jnp.asarray([2.0 / w, 2.0 / h], jnp.float32)
    return grid_sample(x, base + disp * scale)


def _op_perspective(key: jnp.ndarray, x: jnp.ndarray,
                    scale=(0.01, 0.02)) -> jnp.ndarray:
    """iaa.PerspectiveTransform(scale=(0.01, 0.02)): corners jittered inward
    by |N(0, s)| of the image size, 4-point homography, keep_size."""
    b, h, w, _ = x.shape
    k1, k2 = jax.random.split(key)
    s = jax.random.uniform(k1, (b, 1, 1), minval=scale[0], maxval=scale[1])
    jitter = jnp.abs(jax.random.normal(k2, (b, 4, 2))) * s * 2.0
    src = jnp.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])
    sign = jnp.array([[[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]]])
    dst = src[None] + jitter * sign
    hmat = jax.vmap(_solve_homography)(jnp.broadcast_to(src, (b, 4, 2)), dst)
    from ccd_tpu.ops.warp import homography_grid
    return grid_sample(x, homography_grid(hmat, (h, w)))


def _normalize_matrix(h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pixel -> [-1,1] grid-coordinate change of basis (the reference's W_,
    datasetsupervised_kmeans.py:70)."""
    w_ = np.array([[2.0 / (w - 1), 0, -1], [0, 2.0 / (h - 1), -1], [0, 0, 1]],
                  np.float32)
    return w_, np.linalg.inv(w_).astype(np.float32)


@partial(jax.jit, static_argnames=("apply_prob",))
def random_affine_with_theta(rng: jnp.ndarray, images: jnp.ndarray,
                             apply_prob: float = 0.7
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random affine warp with recorded normalized inverse matrix θ.

    Parameter ranges follow ``iaa.Affine`` in the reference pretrain dataset
    (scale .6-1.1, translate ±2%, rotate ±10°, shear x ±45° y ±10°,
    p=0.7); θ is exactly the matrix later used to warp masks/clusters into
    this view's frame. Returns (warped (B,H,W,3), theta (B,3,3)).
    """
    b, h, w, _ = images.shape
    k = jax.random.split(rng, 7)
    sx = jax.random.uniform(k[0], (b,), minval=0.6, maxval=1.1)
    sy = jax.random.uniform(k[1], (b,), minval=0.6, maxval=1.1)
    tx = jax.random.uniform(k[2], (b,), minval=-0.02, maxval=0.02) * w
    ty = jax.random.uniform(k[3], (b,), minval=-0.02, maxval=0.02) * h
    rot = jnp.deg2rad(jax.random.uniform(k[4], (b,), minval=-10.0, maxval=10.0))
    shx = jnp.tan(jnp.deg2rad(jax.random.uniform(k[5], (b,), minval=-45.0, maxval=45.0)))
    shy = jnp.tan(jnp.deg2rad(jax.random.uniform(k[6], (b,), minval=-10.0, maxval=10.0)))

    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    zeros = jnp.zeros_like(sx)
    ones = jnp.ones_like(sx)

    def mat(rows):
        return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)

    center = mat([[ones, zeros, ones * cx], [zeros, ones, ones * cy],
                  [zeros, zeros, ones]])
    center_inv = mat([[ones, zeros, -ones * cx], [zeros, ones, -ones * cy],
                      [zeros, zeros, ones]])
    scale = mat([[sx, zeros, zeros], [zeros, sy, zeros], [zeros, zeros, ones]])
    shear = mat([[ones, shx, zeros], [shy, ones, zeros], [zeros, zeros, ones]])
    rotm = mat([[jnp.cos(rot), -jnp.sin(rot), zeros],
                [jnp.sin(rot), jnp.cos(rot), zeros], [zeros, zeros, ones]])
    trans = mat([[ones, zeros, tx], [zeros, ones, ty], [zeros, zeros, ones]])

    # forward pixel-space map, centered: M = T · C · R · Sh · S · C⁻¹
    m = trans @ center @ rotm @ shear @ scale @ center_inv
    m_inv = jnp.linalg.inv(m)

    w_, w_inv = _normalize_matrix(h, w)
    theta = jnp.einsum("ij,bjk,kl->bil", jnp.asarray(w_), m_inv, jnp.asarray(w_inv))

    apply = jax.random.bernoulli(jax.random.fold_in(rng, 999), apply_prob, (b,))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), theta.shape)
    theta = jnp.where(apply[:, None, None], theta, eye)

    grid = affine_grid(theta[:, :2, :], (h, w))
    warped = grid_sample(images, grid)
    return warped, theta


def _random_affine_matrix(rng, b, h, w, scale=(0.6, 1.1), translate=0.02,
                          rotate=10.0, shear_x=45.0, shear_y=10.0):
    """Sample (B, 3, 3) normalized inverse affine matrices (no image warp)."""
    k = jax.random.split(rng, 7)
    sx = jax.random.uniform(k[0], (b,), minval=scale[0], maxval=scale[1])
    sy = jax.random.uniform(k[1], (b,), minval=scale[0], maxval=scale[1])
    tx = jax.random.uniform(k[2], (b,), minval=-translate, maxval=translate) * w
    ty = jax.random.uniform(k[3], (b,), minval=-translate, maxval=translate) * h
    rot = jnp.deg2rad(jax.random.uniform(k[4], (b,), minval=-rotate, maxval=rotate))
    shx = jnp.tan(jnp.deg2rad(jax.random.uniform(k[5], (b,), minval=-shear_x,
                                                 maxval=shear_x)))
    shy = jnp.tan(jnp.deg2rad(jax.random.uniform(k[6], (b,), minval=-shear_y,
                                                 maxval=shear_y)))
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    zeros = jnp.zeros_like(sx)
    ones = jnp.ones_like(sx)

    def mat(rows):
        return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)

    center = mat([[ones, zeros, ones * cx], [zeros, ones, ones * cy],
                  [zeros, zeros, ones]])
    center_inv = mat([[ones, zeros, -ones * cx], [zeros, ones, -ones * cy],
                      [zeros, zeros, ones]])
    scl = mat([[sx, zeros, zeros], [zeros, sy, zeros], [zeros, zeros, ones]])
    shr = mat([[ones, shx, zeros], [shy, ones, zeros], [zeros, zeros, ones]])
    rotm = mat([[jnp.cos(rot), -jnp.sin(rot), zeros],
                [jnp.sin(rot), jnp.cos(rot), zeros], [zeros, zeros, ones]])
    trn = mat([[ones, zeros, tx], [zeros, ones, ty], [zeros, zeros, ones]])
    m = trn @ center @ rotm @ shr @ scl @ center_inv
    w_, w_inv = _normalize_matrix(h, w)
    return jnp.einsum("ij,bjk,kl->bil", jnp.asarray(w_), jnp.linalg.inv(m),
                      jnp.asarray(w_inv))


def _elastic_grid(rng, b, h, w, scale) -> jnp.ndarray:
    """Identity grid + smooth random displacement (iaa.PiecewiseAffine-like)."""
    xs = (2.0 * jnp.arange(w, dtype=jnp.float32) + 1.0) / w - 1.0
    ys = (2.0 * jnp.arange(h, dtype=jnp.float32) + 1.0) / h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)
    base = jnp.broadcast_to(jnp.stack([gx, gy], -1), (b, h, w, 2))
    coarse = jax.random.uniform(rng, (b, 4, 8, 2), minval=-1.0, maxval=1.0)
    disp = jax.image.resize(coarse, (b, h, w, 2), method="cubic") * scale
    return base + disp


def _solve_homography(s: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """DLT: the 3x3 H mapping corner set ``d`` -> ``s`` (the output grid
    samples the source), solved from the 8x8 linear system."""
    rows = []
    rhs = []
    for i in range(4):
        x, y = d[i, 0], d[i, 1]
        u, v = s[i, 0], s[i, 1]
        rows.append(jnp.array([x, y, 1, 0, 0, 0, 0, 0]) +
                    jnp.concatenate([jnp.zeros(6), -u * d[i]]))
        rows.append(jnp.concatenate([jnp.zeros(3),
                                     jnp.array([x, y, 1.0]),
                                     -v * d[i]]))
        rhs.extend([u, v])
    a = jnp.stack(rows)
    h8 = jnp.linalg.solve(a, jnp.asarray(rhs))
    return jnp.concatenate([h8, jnp.ones(1)]).reshape(3, 3)


def _random_perspective(rng, b, h, w, distortion: float = 0.3) -> jnp.ndarray:
    """(B, 3, 3) normalized projective matrices from jittered corners
    (CVRandomPerspective-style). Solves the 4-point homography per sample."""
    k1, = jax.random.split(rng, 1)
    # source corners in normalized coords
    src = jnp.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])
    jitter = jax.random.uniform(k1, (b, 4, 2), minval=0.0, maxval=distortion)
    sign = jnp.array([[[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]]])
    dst = src[None] + jitter * sign  # corners move inward

    return jax.vmap(_solve_homography)(jnp.broadcast_to(src, (b, 4, 2)), dst)


@jax.jit
def supervised_augment(rng: jnp.ndarray, images: jnp.ndarray) -> jnp.ndarray:
    """Finetune-time staged chain on (B, H, W, 3) float [0,1] images.

    Exact structure of the non-abi pipeline (``dataset_pretrain.py:80-160``,
    ViT-Small probabilities [0.6, 0.8, 0.6, 0.6, 0.6])::

        Sequential[
            Sometimes(0.6, Invert(0.1)),
            Sometimes(0.8, OneOf(35 noise/color/weather ops)),
            Sometimes(0.6, OneOf[Sharpen, OneOf(4 blurs)]),
            Sometimes(0.6, OneOf(8 contrast ops)),
            Sometimes(0.6, OneOf[Affine, PiecewiseAffine(0.01-0.1),
                                 Rotate(-45, 45)]),
        ]
    """
    from ccd_tpu.data import aug_ops as A
    from ccd_tpu.ops.warp import affine_grid, grid_sample
    b, h, w, _ = images.shape
    keys = jax.random.split(rng, 10)
    x = images

    # stage 1: Sometimes(0.6, Invert(0.1)) -> effective p = 0.06
    # (dataset_pretrain.py:81-83; op_invert's default p=0.15 is the pretrain
    # arithmetic-OneOf rate, not this one)
    x = A.sometimes(keys[0], x, 0.6, lambda k, y: A.op_invert(k, y, p=0.1))

    # stage 2 (p=0.8): OneOf over the big arithmetic+color+weather union
    # (dataset_pretrain.py:85-127 — Invert is NOT in this OneOf)
    stage2_ops = ([A.op_channel_shuffle]
                  + [op for op in A.ARITHMETIC_OPS if op is not A.op_invert]
                  + [A.COLOR_OPS[0], A.op_multiply_brightness]
                  + A.COLOR_OPS[1:] + A.WEATHER_OPS)
    x = A.sometimes(keys[1], x, 0.8, lambda k, y: A.one_of(k, y, stage2_ops))

    # stage 3 (p=0.6): OneOf[Sharpen, OneOf(4 blurs)] — no BilateralBlur here
    x = A.sometimes(keys[2], x, 0.6,
                    lambda k, y: A.blur_family(k, y, kinds=A.BLUR_KINDS))

    # stage 4 (p=0.6): OneOf(8 contrast ops)
    x = A.sometimes(keys[3], x, 0.6,
                    lambda k, y: A.one_of(k, y, A.CONTRAST_OPS))

    # stage 5 (p=0.6): OneOf[Affine(same params as pretrain view 2),
    #                        PiecewiseAffine(scale 0.01-0.1), Rotate(-45,45)]
    theta_aff = _random_affine_matrix(keys[4], b, h, w)
    theta_rot = _random_affine_matrix(keys[5], b, h, w, scale=(1.0, 1.0),
                                      translate=0.0, rotate=45.0, shear_x=0.0,
                                      shear_y=0.0)
    which = jax.random.randint(keys[6], (b,), 0, 3)
    theta = jnp.where((which == 0)[:, None, None], theta_aff, theta_rot)
    grid_aff = affine_grid(theta[:, :2, :], (h, w))
    pw_scale = jax.random.uniform(keys[7], (b, 1, 1, 1), minval=0.01,
                                  maxval=0.1) * 2.0  # fraction of [-1,1] span
    grid_el = _elastic_grid(keys[8], b, h, w, pw_scale)
    grid = jnp.where((which == 1)[:, None, None, None], grid_el, grid_aff)
    warped = grid_sample(x, grid)
    x = _blend(x, warped, _gate(keys[9], b, 0.6))
    return x


@jax.jit
def abinet_augment(rng: jnp.ndarray, images: jnp.ndarray) -> jnp.ndarray:
    """ABINet-style augmentation (use_abi=True path; CVGeometry p=.5 w/
    rotation±45/affine/perspective, CVDeterioration p=.25, CVColorJitter
    p=.25 — Dino/dataset/transforms.py:307-366)."""
    from ccd_tpu.ops.warp import affine_grid, grid_sample, homography_grid
    b, h, w, _ = images.shape
    keys = jax.random.split(rng, 12)
    x = images

    # geometry p=0.5: rotate / affine / perspective (uniform pick)
    theta_rot = _random_affine_matrix(keys[0], b, h, w, scale=(1.0, 1.0),
                                      translate=0.0, rotate=45.0, shear_x=0.0,
                                      shear_y=0.0)
    theta_aff = _random_affine_matrix(keys[1], b, h, w, scale=(0.5, 2.0),
                                      translate=0.0, rotate=15.0, shear_x=45.0,
                                      shear_y=15.0)
    hmat = _random_perspective(keys[2], b, h, w, distortion=0.5)
    which = jax.random.randint(keys[3], (b,), 0, 3)
    theta = jnp.where((which == 0)[:, None, None], theta_rot, theta_aff)
    grid_a = affine_grid(theta[:, :2, :], (h, w))
    grid_p = homography_grid(hmat, (h, w))
    grid = jnp.where((which == 2)[:, None, None, None], grid_p, grid_a)
    x = _blend(x, grid_sample(x, grid), _gate(keys[4], b, 0.5))

    # deterioration p=0.25: gaussian noise var 20 / motion blur / pixelate
    noise = jax.random.normal(keys[5], x.shape) * (20.0 ** 0.5 / 255.0)
    c0 = jnp.clip(x + noise, 0, 1)
    c1 = _motion_blur(x, keys[6], 1.0)
    small = jax.image.resize(x, (b, h // 4, w // 4, 3), "linear")
    c2 = jax.image.resize(small, (b, h, w, 3), "nearest")
    pick = jax.random.randint(keys[7], (b,), 0, 3)
    sel = jax.nn.one_hot(pick, 3, dtype=x.dtype)
    det = jnp.einsum("nbhwc,bn->bhwc", jnp.stack([c0, c1, c2]), sel)
    x = _blend(x, det, _gate(keys[8], b, 0.25))

    # color jitter p=0.25: brightness/contrast/saturation
    bright = _per_sample(keys[9], b, 0.5, 1.5)
    contrast = _per_sample(keys[10], b, 0.5, 1.5)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    jit = jnp.clip((x * bright - mean) * contrast + mean, 0, 1)
    x = _blend(x, jit, _gate(keys[11], b, 0.25))
    return x


def pretrain_views(rng: jnp.ndarray, images: jnp.ndarray, severity: int = 5
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build the 3-view pretrain batch on device.

    images: (B, H, W, 3) float [0,1] resized raw images.
    Returns (views (B, 3, H, W, 3) ImageNet-normalized, theta (B, 3, 3)):
    view0 = raw, view1 = photometric, view2 = photometric + affine(θ)
    (``_process_training``, datasetsupervised_kmeans.py:48-87).
    """
    k1, k2, k3 = jax.random.split(rng, 3)
    v1 = photometric_augment(k1, images, severity)
    v2p = photometric_augment(k2, images, severity)
    v2, theta = random_affine_with_theta(k3, v2p)
    views = jnp.stack([normalize(images), normalize(v1), normalize(v2)], axis=1)
    return views, theta
