"""Device-side (batched, jit-compatible) equivalents of the imgaug ops used
by the reference augmentation pipelines.

Parity targets: the severity-5 pretrain chain
(``Dino/dataset/augmentation_pipelines.py:122-208``) and the staged finetune
chain (``Dino/dataset/dataset_pretrain.py:80-160``). Every op listed there
has a batched counterpart here, applied to (B, H, W, 3) float [0,1] images
with per-sample parameters. Where an exact port is impractical on TPU the op
is an explicitly documented approximation (see PARITY.md "augmentation"
section for the op-by-op map):

* ``BilateralBlur`` -> TRUE bilateral (cv2 disc window + L1 color distance,
  cv2-anchored test); only d is fixed at 5 instead of sampled (3, 10)
* ``CLAHE`` -> REAL 8x8-tile clip-limited CLAHE with cv2's clip/redistribute
  arithmetic and bilinear tile interpolation (cv2-anchored test); the RGB op
  applies it on luminance w/ ratio rescale (imgaug uses the Lab L channel)
* ``DirectedEdgeDetect`` -> exact imgaug kernel math (reconstructed from
  imgaug 0.4.0 augmenters/convolutional.py; imgaug itself is not installed)
* ``AdditivePoissonNoise`` -> moment-matched rounded gaussian
* ``MedianBlur k=7`` -> k in {3,5} (25-way sorts; 49-way not worth it)
* ``KMeansColorQuantization`` -> true mini-batch Lloyd (4 iters, k in 2..16)
* conv border mode: edge replication vs cv2's BORDER_REFLECT_101

All randomness is derived from explicit jax PRNG keys; every op draws its
parameters per sample so a batch mixes parameterizations exactly like the
per-image imgaug pipeline.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

Op = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]  # (key, x) -> x'


# ------------------------------------------------------------------ helpers

def _u(key, b, lo, hi):
    return jax.random.uniform(key, (b, 1, 1, 1), minval=lo, maxval=hi)


def one_of(key: jnp.ndarray, x: jnp.ndarray, ops: Sequence[Op]) -> jnp.ndarray:
    """iaa.OneOf: per-sample uniform choice among ``ops`` (all candidates are
    computed — cheap VPU work XLA fuses; selection is a one-hot weighted sum,
    NOT a gather: a (N,B,H,W,C) take_along_axis costs ~3 ms on TPU while the
    multiply-reduce is HBM-bound at ~0.1 ms)."""
    ks = jax.random.split(key, len(ops) + 1)
    cands = jnp.stack([op(ks[i], x) for i, op in enumerate(ops)])
    choice = jax.random.randint(ks[-1], (x.shape[0],), 0, len(ops))
    sel = jax.nn.one_hot(choice, len(ops), dtype=x.dtype)     # (B, N)
    return jnp.einsum("nbhwc,bn->bhwc", cands, sel)


def sometimes(key: jnp.ndarray, x: jnp.ndarray, p: float, op: Op) -> jnp.ndarray:
    """iaa.Sometimes(p, op): per-sample Bernoulli gate."""
    k1, k2 = jax.random.split(key)
    gate = jax.random.bernoulli(k1, p, (x.shape[0], 1, 1, 1)).astype(x.dtype)
    return x * (1.0 - gate) + op(k2, x) * gate


def some_of_random_order(key: jnp.ndarray, x: jnp.ndarray,
                         ops: Sequence[Op]) -> jnp.ndarray:
    """iaa.SomeOf((1, None), ops, random_order=True): per-sample random
    subset (size uniform in [1, len(ops)]) applied sequentially in a
    per-sample random ORDER (the severity-2 chain). Exact semantics: len(ops)
    sequential slots; in slot s each sample applies op perm[s] (one-hot
    select over all candidates) while s < n_apply — len^2 op evaluations,
    all fusable batch work."""
    n = len(ops)
    b = x.shape[0]
    k_perm, k_n, k_ops = jax.random.split(key, 3)
    perms = jax.vmap(lambda k: jax.random.permutation(k, n))(
        jax.random.split(k_perm, b))                       # (B, n)
    n_apply = jax.random.randint(k_n, (b,), 1, n + 1)
    for s in range(n):
        ks = jax.random.split(jax.random.fold_in(k_ops, s), n)
        cands = jnp.stack([op(ks[i], x) for i, op in enumerate(ops)])
        sel = jax.nn.one_hot(perms[:, s], n, dtype=x.dtype)
        y = jnp.einsum("nbhwc,bn->bhwc", cands, sel)
        active = (s < n_apply).astype(x.dtype)[:, None, None, None]
        x = x * (1.0 - active) + y * active
    return x


def _conv3x3(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3 convolution with per-sample kernels via 9 shifted adds.

    x: (B, H, W, C); k: (B, 3, 3) or (3, 3). Edge padding (approximates
    cv2's reflect border on 32x128 text crops).
    """
    b, h, w, _ = x.shape
    if k.ndim == 2:
        k = jnp.broadcast_to(k, (b, 3, 3))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    out = jnp.zeros_like(x)
    for i in range(3):
        for j in range(3):
            out = out + k[:, i, j, None, None, None] * xp[:, i:i + h, j:j + w]
    return out


def _rgb_to_hsv(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) [0,1] RGB -> HSV with H in [0,1)."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    d = mx - mn
    safe_d = jnp.where(d > 0, d, 1.0)
    h = jnp.where(mx == r, (g - b) / safe_d % 6.0,
                  jnp.where(mx == g, (b - r) / safe_d + 2.0,
                            (r - g) / safe_d + 4.0)) / 6.0
    h = jnp.where(d > 0, h, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    # branch-free "K-function" formulation — pure VPU arithmetic (jnp.choose
    # lowers to slow per-element selects/gathers on TPU)
    h, s, v = hsv[..., 0] % 1.0, hsv[..., 1], hsv[..., 2]

    def chan(n):
        k = (n + h * 6.0) % 6.0
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([chan(5.0), chan(3.0), chan(1.0)], axis=-1)


def _luma(x: jnp.ndarray) -> jnp.ndarray:
    return (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])[..., None]


# cv2 RGB<->Lab math (8-bit path: values treated as linear RGB, no sRGB
# gamma; L scaled x255/100 and a/b offset +128 in 8-bit units)
_LAB_M = np.array([[0.412453, 0.357580, 0.180423],
                   [0.212671, 0.715160, 0.072169],
                   [0.019334, 0.119193, 0.950227]], np.float32)
_LAB_WHITE = np.array([0.950456, 1.0, 1.088754], np.float32)


def _srgb_linearize(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c <= 0.04045, c / 12.92,
                     ((c + 0.055) / 1.055) ** 2.4)


def _srgb_delinearize(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c <= 0.0031308, 12.92 * c,
                     1.055 * jnp.maximum(c, 1e-12) ** (1.0 / 2.4) - 0.055)


def _rgb_to_lab(x: jnp.ndarray):
    """(B, H, W, 3) RGB [0,1] -> (L in [0,100], a, b centered at 0),
    cv2.COLOR_RGB2Lab math (sRGB linearization + D65 XYZ + Lab f-curve;
    verified against cv2 5.0 in test_lab_matches_cv2)."""
    xyz = jnp.einsum("...c,dc->...d", _srgb_linearize(x), jnp.asarray(_LAB_M))
    t = xyz / jnp.asarray(_LAB_WHITE)
    f = jnp.where(t > 0.008856, jnp.cbrt(jnp.maximum(t, 1e-12)),
                  7.787 * t + 16.0 / 116.0)
    lum = jnp.where(t[..., 1] > 0.008856, 116.0 * f[..., 1] - 16.0,
                    903.3 * t[..., 1])
    a = 500.0 * (f[..., 0] - f[..., 1])
    bb = 200.0 * (f[..., 1] - f[..., 2])
    return lum, a, bb


def _lab_to_rgb(lum: jnp.ndarray, a: jnp.ndarray, bb: jnp.ndarray):
    """Inverse of :func:`_rgb_to_lab` (cv2.COLOR_Lab2RGB float math)."""
    fy = (lum + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - bb / 200.0

    def finv(f):
        return jnp.where(f > 0.206893, f * f * f, (f - 16.0 / 116.0) / 7.787)

    y = jnp.where(lum > 7.9996248, fy * fy * fy, lum / 903.3)
    xyz = jnp.stack([finv(fx), y, finv(fz)], axis=-1) * jnp.asarray(_LAB_WHITE)
    rgb = jnp.einsum("...d,dc->...c", xyz,
                     jnp.asarray(np.linalg.inv(_LAB_M).T.astype(np.float32)))
    return jnp.clip(_srgb_delinearize(rgb), 0.0, 1.0)


def _smooth_field(key, b, h, w, octaves=((4, 8), (8, 32)), method="linear"):
    """Multi-octave smooth noise in [-1, 1], (B, H, W, 1)."""
    ks = jax.random.split(key, len(octaves))
    field = jnp.zeros((b, h, w, 1))
    amp = 1.0
    total = 0.0
    for k, (ch, cw) in zip(ks, octaves):
        coarse = jax.random.uniform(k, (b, ch, cw, 1), minval=-1.0, maxval=1.0)
        field = field + amp * jax.image.resize(coarse, (b, h, w, 1), method)
        total += amp
        amp *= 0.5
    return field / total


# ------------------------------------------------------------------ arithmetic
# (augmentation_pipelines.py:124-146)

def op_add_elementwise(key, x):
    """iaa.AddElementwise((-40, 40)): per-pixel uniform add."""
    b, h, w, _ = x.shape
    add = jax.random.uniform(key, (b, h, w, 1), minval=-40 / 255, maxval=40 / 255)
    return jnp.clip(x + add, 0, 1)


def op_additive_gaussian(key, x, scale_max=0.2):
    """iaa.AdditiveGaussianNoise(scale=(0, 0.2*255))."""
    k1, k2 = jax.random.split(key)
    b, h, w, _ = x.shape
    sigma = _u(k1, b, 0.0, scale_max)
    return jnp.clip(x + jax.random.normal(k2, (b, h, w, 1)) * sigma, 0, 1)


def op_additive_laplace(key, x, scale_max=0.2):
    """iaa.AdditiveLaplaceNoise(scale=(0, 0.2*255))."""
    k1, k2 = jax.random.split(key)
    b, h, w, _ = x.shape
    sigma = _u(k1, b, 0.0, scale_max)
    return jnp.clip(x + jax.random.laplace(k2, (b, h, w, 1)) * sigma, 0, 1)


def poisson_counts(key, lam: jnp.ndarray, shape, k_max: int = 128,
                   chunk: int = 32) -> jnp.ndarray:
    """Exact Poisson sampling by inverse-CDF compare-sum (gather-free).

    ``lam``: (B,) per-sample rates; returns float counts of shape
    ``(B, *shape)``. The per-sample CDF table ``cdf[b, n] = P(X <= n)`` is
    built in log space (``n log lam - lam - lgamma(n+1)``, cumsum of exp) and
    each uniform draw is inverted as ``count = sum_n [u > cdf_n]`` — a
    broadcast compare-sum processed ``chunk`` entries per scan step so no
    (B, *shape, k_max) intermediate is ever materialized. Distributionally
    exact up to the k_max truncation: for lam <= 40,
    ``P(X > 128) < 1e-28`` — far below the 2^-32 resolution of the uniform
    draw itself. (jax.random.poisson is threefry-only and its rejection
    sampler is slow on TPU; this is the TPU-native equivalent.)
    """
    k1, k2 = jax.random.split(key)
    n = jnp.arange(k_max, dtype=jnp.float32)
    logpmf = n[None, :] * jnp.log(lam[:, None]) - lam[:, None] \
        - jax.lax.lgamma(n[None, :] + 1.0)
    cdf = jnp.cumsum(jnp.exp(logpmf), axis=-1)                  # (B, k_max)
    u = jax.random.uniform(k2, (lam.shape[0],) + tuple(shape))
    bshape = (lam.shape[0],) + (1,) * len(shape)

    def body(count, cdf_chunk):                                 # (B, chunk)
        cc = cdf_chunk.reshape(bshape + (chunk,))
        return count + jnp.sum(u[..., None] > cc, axis=-1,
                               dtype=jnp.float32), None

    chunks = cdf.reshape(lam.shape[0], k_max // chunk, chunk).transpose(1, 0, 2)
    count, _ = jax.lax.scan(body, jnp.zeros_like(u), chunks)
    return count


def op_additive_poisson(key, x, lam_max=40.0):
    """iaa.AdditivePoissonNoise(lam=(0, 40)): adds Poisson(lam)/255 samples,
    drawn EXACTLY via the inverse-CDF compare-sum (``poisson_counts``)."""
    k1, k2 = jax.random.split(key)
    b, h, w, _ = x.shape
    lam = jnp.maximum(_u(k1, b, 0.0, lam_max).reshape(b), 1e-3)
    noise = poisson_counts(k2, lam, (h, w, 1))
    return jnp.clip(x + noise.astype(x.dtype) / 255.0, 0, 1)


def _maybe_per_channel(key, b, lo, hi, p_per_channel):
    k1, k2, k3 = jax.random.split(key, 3)
    per_px = jax.random.uniform(k1, (b, 1, 1, 3), minval=lo, maxval=hi)
    single = jax.random.uniform(k2, (b, 1, 1, 1), minval=lo, maxval=hi)
    pc = jax.random.bernoulli(k3, p_per_channel, (b, 1, 1, 1))
    return jnp.where(pc, per_px, jnp.broadcast_to(single, per_px.shape))


def op_multiply(key, x):
    """iaa.Multiply((0.5, 1.5), per_channel=0.5)."""
    mul = _maybe_per_channel(key, x.shape[0], 0.5, 1.5, 0.5)
    return jnp.clip(x * mul, 0, 1)


def op_multiply_elementwise(key, x, p_per_channel=0.5):
    """iaa.MultiplyElementwise((0.5, 1.5), per_channel=0.5)."""
    k1, k2, k3 = jax.random.split(key, 3)
    b, h, w, c = x.shape
    per = jax.random.uniform(k1, (b, h, w, c), minval=0.5, maxval=1.5)
    mono = jax.random.uniform(k2, (b, h, w, 1), minval=0.5, maxval=1.5)
    pc = jax.random.bernoulli(k3, p_per_channel, (b, 1, 1, 1))
    return jnp.clip(x * jnp.where(pc, per, jnp.broadcast_to(mono, per.shape)), 0, 1)


def op_dropout(key, x, p_max=0.1):
    """iaa.Dropout(p=(0, 0.1), per_channel=0.5)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    b, h, w, c = x.shape
    p = _u(k1, b, 0.0, p_max)
    drop_pc = jax.random.uniform(k2, (b, h, w, c)) < p
    drop_mono = jax.random.uniform(k3, (b, h, w, 1)) < p
    pc = jax.random.bernoulli(k4, 0.5, (b, 1, 1, 1))
    drop = jnp.where(pc, drop_pc, jnp.broadcast_to(drop_mono, drop_pc.shape))
    return jnp.where(drop, 0.0, x)


def op_coarse_dropout(key, x, p=0.02, size_percent=0.15, per_channel=0.5):
    """iaa.CoarseDropout(0.02, size_percent=..., per_channel=...)."""
    k1, k2, k3 = jax.random.split(key, 3)
    b, h, w, c = x.shape
    ch = max(int(h * size_percent), 2)
    cw = max(int(w * size_percent), 2)
    drop_pc = jax.random.uniform(k1, (b, ch, cw, c)) < p
    drop_mono = jax.random.uniform(k2, (b, ch, cw, 1)) < p
    pc = jax.random.bernoulli(k3, per_channel, (b, 1, 1, 1))
    drop = jnp.where(pc, drop_pc, jnp.broadcast_to(drop_mono, drop_pc.shape))
    big = jax.image.resize(drop.astype(x.dtype), (b, h, w, c), "nearest")
    return x * (1.0 - big)


def op_dropout2d(key, x, p=0.5):
    """iaa.Dropout2d(p=0.5): drop whole channels, always keeping >= 1
    (imgaug's nb_keep_channels=1 default)."""
    k1, k2 = jax.random.split(key)
    b = x.shape[0]
    keep = ~jax.random.bernoulli(k1, p, (b, 1, 1, 3))
    # force at least one kept channel: if all dropped, keep a random one
    any_kept = keep.any(axis=-1, keepdims=True)
    forced = jax.nn.one_hot(jax.random.randint(k2, (b, 1, 1), 0, 3), 3) > 0.5
    keep = jnp.where(any_kept, keep, forced)
    return x * keep.astype(x.dtype)


def _salt_pepper(key, x, p, salt=True, pepper=True, per_channel=False):
    b, h, w, c = x.shape
    shape = (b, h, w, c) if per_channel else (b, h, w, 1)
    u = jax.random.uniform(key, shape)
    out = x
    if salt and pepper:
        out = jnp.where(u < p / 2, 0.0, jnp.where(u > 1 - p / 2, 1.0, out))
    elif salt:
        out = jnp.where(u < p, 1.0, out)
    elif pepper:
        out = jnp.where(u < p, 0.0, out)
    return out


def op_impulse_noise(key, x, p=0.1):
    """iaa.ImpulseNoise(0.1) = salt&pepper with per-channel randomness."""
    return _salt_pepper(key, x, p, per_channel=True)


def op_salt_and_pepper(key, x, p=0.1):
    return _salt_pepper(key, x, p)


def op_salt(key, x, p=0.1):
    return _salt_pepper(key, x, p, pepper=False)


def op_pepper(key, x, p=0.1):
    return _salt_pepper(key, x, p, salt=False)


def op_invert(key, x, p=0.15):
    """iaa.Invert(0.15): per-sample invert with internal probability p."""
    gate = jax.random.bernoulli(key, p, (x.shape[0], 1, 1, 1)).astype(x.dtype)
    return x * (1 - gate) + (1.0 - x) * gate


def op_solarize(key, x, p=0.5, thresh=(32 / 255, 128 / 255)):
    """iaa.Solarize(0.5, threshold=(32, 128)): invert pixels >= threshold."""
    k1, k2 = jax.random.split(key)
    b = x.shape[0]
    t = _u(k1, b, thresh[0], thresh[1])
    sol = jnp.where(x >= t, 1.0 - x, x)
    gate = jax.random.bernoulli(k2, p, (b, 1, 1, 1)).astype(x.dtype)
    return x * (1 - gate) + sol * gate


# --------------- JPEG compression (real blockwise DCT quantization)

_DCT8 = np.stack([
    (np.sqrt((1.0 if k == 0 else 2.0) / 8.0)
     * np.cos((2 * np.arange(8) + 1) * k * np.pi / 16.0))
    for k in range(8)
]).astype(np.float32)  # (8, 8) orthonormal DCT-II matrix

# ITU-T T.81 Annex K quantization tables
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61], [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56], [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77], [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101], [72, 92, 95, 98, 112, 100, 103, 99],
], np.float32)
_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99], [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99], [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99], [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99], [99, 99, 99, 99, 99, 99, 99, 99],
], np.float32)


def _jpeg_channel(chan: jnp.ndarray, qtable: jnp.ndarray) -> jnp.ndarray:
    """Blockwise DCT -> quantize(round) -> inverse. chan: (B, H, W) in
    [-128, 127] JPEG level-shifted units; qtable: (B, 8, 8)."""
    b, h, w = chan.shape
    blocks = chan.reshape(b, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)
    d = jnp.asarray(_DCT8)
    coef = jnp.einsum("ij,bnmjk,lk->bnmil", d, blocks, d)
    q = qtable[:, None, None]
    coef = jnp.round(coef / q) * q
    out = jnp.einsum("ji,bnmjk,kl->bnmil", d, coef, d)
    return out.transpose(0, 1, 3, 2, 4).reshape(b, h, w)


def op_jpeg_compression(key, x, compression=(70, 99)):
    """iaa.JpegCompression(compression=(70, 99)) — true 8x8 DCT quantization
    with the T.81 tables at quality = 100 - compression, including 2x chroma
    subsampling. H and W must be multiples of 16 (32x128 is)."""
    b, h, w, _ = x.shape
    comp = jax.random.uniform(key, (b,), minval=compression[0],
                              maxval=compression[1])
    quality = 100.0 - comp
    # libjpeg quality -> table scale factor
    scale = jnp.where(quality < 50, 5000.0 / quality, 200.0 - 2.0 * quality)
    ql = jnp.clip(jnp.floor((jnp.asarray(_Q_LUMA) * scale[:, None, None]
                             + 50.0) / 100.0), 1, 255)
    qc = jnp.clip(jnp.floor((jnp.asarray(_Q_CHROMA) * scale[:, None, None]
                             + 50.0) / 100.0), 1, 255)

    r, g, bch = x[..., 0] * 255, x[..., 1] * 255, x[..., 2] * 255
    y = 0.299 * r + 0.587 * g + 0.114 * bch - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * bch
    cr = 0.5 * r - 0.418688 * g - 0.081312 * bch

    y = _jpeg_channel(y, ql)
    # 4:2:0 chroma subsampling
    def sub(c):
        small = jax.image.resize(c[..., None], (b, h // 2, w // 2, 1), "linear")
        small = _jpeg_channel(small[..., 0], qc)
        return jax.image.resize(small[..., None], (b, h, w, 1), "linear")[..., 0]
    cb, cr = sub(cb), sub(cr)

    y = y + 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bch = y + 1.772 * cb
    return jnp.clip(jnp.stack([r, g, bch], axis=-1) / 255.0, 0, 1)


def op_emboss(key, x):
    """iaa.Emboss(alpha=(0,1), strength=(0.5,1.5))."""
    k1, k2 = jax.random.split(key)
    b = x.shape[0]
    s = jax.random.uniform(k1, (b,), minval=0.5, maxval=1.5)
    alpha = _u(k2, b, 0.0, 1.0)
    z = jnp.zeros_like(s)
    one = jnp.ones_like(s)
    kern = jnp.stack([jnp.stack([-1 - s, -s, z], -1),
                      jnp.stack([-s, one, s], -1),
                      jnp.stack([z, s, 1 + s], -1)], -2)
    emb = jnp.clip(_conv3x3(x, kern), 0, 1)
    return x * (1 - alpha) + emb * alpha


_EDGE_KERNEL = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float32)


def op_edge_detect(key, x):
    """iaa.EdgeDetect(alpha=(0,1))."""
    alpha = _u(key, x.shape[0], 0.0, 1.0)
    edge = jnp.clip(jnp.abs(_conv3x3(x, jnp.asarray(_EDGE_KERNEL))), 0, 1)
    return x * (1 - alpha) + edge * alpha


# the 8 neighbor cells of a 3x3 kernel, (x, y) offsets in row-major order
_DED_CELLS = np.array([(xx, yy) for yy in (-1, 0, 1) for xx in (-1, 0, 1)
                       if not (xx == 0 and yy == 0)], np.float32)
_DED_CELLS_N = _DED_CELLS / np.linalg.norm(_DED_CELLS, axis=1, keepdims=True)


def directed_edge_kernel(alpha: jnp.ndarray, direction: jnp.ndarray
                         ) -> jnp.ndarray:
    """The imgaug DirectedEdgeDetect kernel (augmenters/convolutional.py):
    ``deg = int(direction*360) % 360``; each neighbor cell's weight is
    ``(1 - angle_distance(cell, direction)/180)**4``, normalized over the 8
    cells, negated with center 1, then blended with the identity kernel by
    ``alpha`` — so the final kernel is center 1, neighbors ``-alpha * w``.

    alpha, direction: (B,) in [0,1]. Returns (B, 3, 3)."""
    deg = jnp.floor(direction * 360.0) % 360.0
    rad = jnp.deg2rad(deg)
    dvec = jnp.stack([jnp.cos(rad - 0.5 * jnp.pi),
                      jnp.sin(rad - 0.5 * jnp.pi)], axis=-1)        # (B, 2)
    cos = jnp.clip(dvec @ jnp.asarray(_DED_CELLS_N).T, -1.0, 1.0)   # (B, 8)
    dist = jnp.rad2deg(jnp.arccos(cos)) / 180.0
    sim = (1.0 - dist) ** 4
    sim = sim / jnp.sum(sim, axis=-1, keepdims=True)
    w = -alpha[:, None] * sim                                       # (B, 8)
    b = alpha.shape[0]
    rows = [w[:, 0:3],
            jnp.stack([w[:, 3], jnp.ones((b,)), w[:, 4]], axis=-1),
            w[:, 5:8]]
    return jnp.stack(rows, axis=-2)


def op_directed_edge_detect(key, x):
    """iaa.DirectedEdgeDetect(alpha=(0,1), direction=(0,1)) with the exact
    imgaug kernel math (see ``directed_edge_kernel``); border handling is
    edge-replicate vs cv2 reflect (the documented library-wide difference)."""
    k1, k2 = jax.random.split(key)
    b = x.shape[0]
    alpha = jax.random.uniform(k1, (b,))
    direction = jax.random.uniform(k2, (b,))
    kern = directed_edge_kernel(alpha, direction)
    return jnp.clip(_conv3x3(x, kern), 0, 1)


_EDGE_ENHANCE_MORE = np.array([[-1, -1, -1], [-1, 9, -1], [-1, -1, -1]],
                              np.float32)
_CONTOUR = np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]], np.float32)


def op_edge_enhance_more(key, x):
    """iaa.pillike.FilterEdgeEnhanceMore (PIL EDGE_ENHANCE_MORE kernel)."""
    del key
    return jnp.clip(_conv3x3(x, jnp.asarray(_EDGE_ENHANCE_MORE)), 0, 1)


def op_contour(key, x):
    """iaa.pillike.FilterContour (PIL CONTOUR: 8-neighbour kernel, offset 255)."""
    del key
    return jnp.clip(_conv3x3(1.0 - x, jnp.asarray(_CONTOUR)), 0, 1)


ARITHMETIC_OPS: List[Op] = [
    op_add_elementwise, op_additive_gaussian, op_additive_laplace,
    op_additive_poisson, op_multiply, op_multiply_elementwise, op_dropout,
    op_coarse_dropout, op_dropout2d, op_impulse_noise, op_salt_and_pepper,
    op_salt, op_pepper, op_invert, op_solarize, op_jpeg_compression,
    op_emboss, op_edge_detect, op_directed_edge_detect, op_edge_enhance_more,
    op_contour,
]


# ------------------------------------------------------------------ color
# (augmentation_pipelines.py:147-163)

def op_hue_add(key, x, add=(0, 50)):
    """WithColorspace(HSV, WithChannels(0, Add((0,50)))) — OpenCV H is 0..179,
    so the add is delta/180 of a full hue turn."""
    b = x.shape[0]
    delta = jax.random.uniform(key, (b, 1, 1), minval=add[0] / 180,
                               maxval=add[1] / 180)
    hsv = _rgb_to_hsv(x)
    return _hsv_to_rgb(hsv.at[..., 0].add(delta))


def op_hue_add_strong(key, x):
    """Sequential(RGB->HSV, H += (50,100), HSV->RGB)."""
    return op_hue_add(key, x, add=(50, 100))


def op_multiply_and_add_to_brightness(key, x):
    """iaa.MultiplyAndAddToBrightness(mul=(0.5,1.5), add=(-30,30)) on V."""
    k1, k2 = jax.random.split(key)
    b = x.shape[0]
    mul = jax.random.uniform(k1, (b, 1, 1), minval=0.5, maxval=1.5)
    add = jax.random.uniform(k2, (b, 1, 1), minval=-30 / 255, maxval=30 / 255)
    hsv = _rgb_to_hsv(x)
    v = jnp.clip(hsv[..., 2] * mul + add, 0, 1)
    return _hsv_to_rgb(hsv.at[..., 2].set(v))


def op_multiply_brightness(key, x):
    """iaa.MultiplyBrightness((0.5, 1.5))."""
    mul = jax.random.uniform(key, (x.shape[0], 1, 1), minval=0.5, maxval=1.5)
    hsv = _rgb_to_hsv(x)
    return _hsv_to_rgb(hsv.at[..., 2].set(jnp.clip(hsv[..., 2] * mul, 0, 1)))


def op_multiply_hue_saturation(key, x):
    """iaa.MultiplyHueAndSaturation((0.5,1.5), per_channel=True)."""
    k1, k2 = jax.random.split(key)
    b = x.shape[0]
    mh = jax.random.uniform(k1, (b, 1, 1), minval=0.5, maxval=1.5)
    ms = jax.random.uniform(k2, (b, 1, 1), minval=0.5, maxval=1.5)
    hsv = _rgb_to_hsv(x)
    hsv = hsv.at[..., 0].multiply(mh)
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * ms, 0, 1))
    return _hsv_to_rgb(hsv)


def op_add_hue_saturation(key, x):
    """iaa.AddToHueAndSaturation((-50,50), per_channel=True) — OpenCV scales:
    H delta/180, S delta/255."""
    k1, k2 = jax.random.split(key)
    b = x.shape[0]
    dh = jax.random.uniform(k1, (b, 1, 1), minval=-50 / 180, maxval=50 / 180)
    ds = jax.random.uniform(k2, (b, 1, 1), minval=-50 / 255, maxval=50 / 255)
    hsv = _rgb_to_hsv(x)
    hsv = hsv.at[..., 0].add(dh)
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] + ds, 0, 1))
    return _hsv_to_rgb(hsv)


def op_grayscale(key, x):
    """iaa.Grayscale(alpha=(0.0, 1.0))."""
    alpha = _u(key, x.shape[0], 0.0, 1.0)
    return x * (1 - alpha) + _luma(x) * alpha


def op_kmeans_color_quantization(key, x, n_iters=4):
    """iaa.KMeansColorQuantization(): joint-RGB Lloyd with k ~ U{2..16},
    initialized from random pixels (mini but real k-means)."""
    k1, k2, k3 = jax.random.split(key, 3)
    b, h, w, c = x.shape
    kmax = 16
    flat = x.reshape(b, h * w, c)
    idx = jax.random.randint(k1, (b, kmax), 0, h * w)
    centers = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, K, 3)
    k_eff = jax.random.randint(k2, (b, 1), 2, kmax + 1)
    slot_ok = jnp.arange(kmax)[None] < k_eff                      # (B, K)

    def lloyd(centers, _):
        d = jnp.sum((flat[:, :, None] - centers[:, None]) ** 2, -1)
        d = jnp.where(slot_ok[:, None], d, jnp.inf)
        assign = jax.nn.one_hot(jnp.argmin(d, -1), kmax)          # (B, HW, K)
        counts = assign.sum(1)[..., None]
        new = jnp.einsum("bpk,bpc->bkc", assign, flat) / jnp.maximum(counts, 1)
        return jnp.where(counts > 0, new, centers), None

    centers, _ = jax.lax.scan(lloyd, centers, None, length=n_iters)
    d = jnp.sum((flat[:, :, None] - centers[:, None]) ** 2, -1)
    d = jnp.where(slot_ok[:, None], d, jnp.inf)
    # center lookup as a one-hot matmul (a per-pixel gather is slow on TPU)
    assign = jax.nn.one_hot(jnp.argmin(d, -1), kmax)
    out = jnp.einsum("bpk,bkc->bpc", assign, centers)
    del k3
    return out.reshape(b, h, w, c)


def op_uniform_color_quantization(key, x):
    """iaa.UniformColorQuantization(): k ~ U{2..16} uniform levels/channel."""
    b = x.shape[0]
    k = jax.random.randint(key, (b, 1, 1, 1), 2, 17).astype(x.dtype)
    return jnp.clip(jnp.round(x * (k - 1)) / jnp.maximum(k - 1, 1), 0, 1)


def _kelvin_to_rgb(t):
    """Tanner Helland blackbody approximation; t (B,) kelvin -> (B,3) [0,1]."""
    t = t / 100.0
    r = jnp.where(t <= 66, 1.0,
                  jnp.clip(1.292936 * jnp.maximum(t - 60, 1e-3) ** -0.1332047,
                           0, 1))
    g = jnp.where(t <= 66,
                  jnp.clip(0.3900816 * jnp.log(jnp.maximum(t, 1e-3))
                           - 0.6318414, 0, 1),
                  jnp.clip(1.1298909 * jnp.maximum(t - 60, 1e-3) ** -0.0755148,
                           0, 1))
    b = jnp.where(t >= 66, 1.0,
                  jnp.where(t <= 19, 0.0,
                            jnp.clip(0.5432068 * jnp.log(jnp.maximum(t - 10,
                                                                     1e-3))
                                     - 1.1962541, 0, 1)))
    return jnp.stack([r, g, b], -1)


def op_change_color_temperature(key, x):
    """iaa.ChangeColorTemperature((1100, 10000))."""
    t = jax.random.uniform(key, (x.shape[0],), minval=1100.0, maxval=10000.0)
    rgb = _kelvin_to_rgb(t)[:, None, None]
    return jnp.clip(x * rgb, 0, 1)


COLOR_OPS: List[Op] = [
    op_hue_add, op_multiply_and_add_to_brightness, op_multiply_hue_saturation,
    op_add_hue_saturation, op_hue_add_strong, op_grayscale,
    op_kmeans_color_quantization, op_uniform_color_quantization,
    op_change_color_temperature,
]


# ------------------------------------------------------------------ blur
# (augmentation_pipelines.py:164-178)

def gaussian_blur(x: jnp.ndarray, sigma: jnp.ndarray, taps: int = 5
                  ) -> jnp.ndarray:
    """Separable per-sample gaussian blur; sigma (B,) or (B,1,1,1)."""
    b, h, w, _ = x.shape
    r = taps // 2
    offsets = jnp.arange(-r, r + 1, dtype=jnp.float32)
    sig = jnp.maximum(sigma.reshape(b, 1), 1e-3)
    k = jnp.exp(-0.5 * (offsets[None, :] / sig) ** 2)
    k = k / k.sum(axis=1, keepdims=True)
    # accumulated shifted-slice FMAs, not stack+einsum: the (B,H,W,C,taps)
    # stack materializes taps x the image through HBM, while the FMA chain
    # fuses into one elementwise pass (measured ~5x on the TPU)
    kt = [k[:, t, None, None, None] for t in range(taps)]
    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0), (0, 0)), mode="edge")
    x = sum(kt[t] * xp[:, t:t + h] for t in range(taps))
    xp = jnp.pad(x, ((0, 0), (0, 0), (r, r), (0, 0)), mode="edge")
    return sum(kt[t] * xp[:, :, t:t + w] for t in range(taps))


def op_sharpen(key, x):
    """iaa.Sharpen(alpha=(0,0.5), lightness=(0,0.5)): PIL-style kernel
    [[-1,-1,-1],[-1,8+l,-1],[-1,-1,-1]] blended by alpha."""
    k1, k2 = jax.random.split(key)
    b = x.shape[0]
    light = jax.random.uniform(k1, (b,), minval=0.0, maxval=0.5)
    alpha = _u(k2, b, 0.0, 0.5)
    base = jnp.asarray(np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]],
                                np.float32))
    kern = jnp.broadcast_to(base, (b, 3, 3)).at[:, 1, 1].add(light)
    sharp = jnp.clip(_conv3x3(x, kern), 0, 1)
    return x * (1 - alpha) + sharp * alpha


def op_gaussian_blur(key, x):
    """iaa.GaussianBlur((0.5, 1.5))."""
    sigma = jax.random.uniform(key, (x.shape[0],), minval=0.5, maxval=1.5)
    return gaussian_blur(x, sigma)


def op_average_blur(key, x):
    """iaa.AverageBlur(k=(2, 6)) — cv2.blur with the FULL per-sample
    k ∈ {2, 3, 4, 5, 6} draw, including even kernels: cv2's default anchor
    for even k is k//2, so the window covers offsets [-(k//2), k - k//2 - 1]
    (a half-pixel phase shift toward the top-left). Separable sliding sums,
    edge padding (cv2: reflect-101; border ring only)."""
    b, h, w, _ = x.shape
    ks = (2, 3, 4, 5, 6)

    def box(k):
        a = k // 2                       # cv2 anchor
        lp, rp = a, k - a - 1
        xp = jnp.pad(x, ((0, 0), (lp, rp), (0, 0), (0, 0)), mode="edge")
        rows = sum(xp[:, i:i + h] for i in range(k)) / k
        xp2 = jnp.pad(rows, ((0, 0), (0, 0), (lp, rp), (0, 0)), mode="edge")
        return sum(xp2[:, :, j:j + w] for j in range(k)) / k

    outs = jnp.stack([box(k) for k in ks])              # (5, B, H, W, C)
    kk = jax.random.randint(key, (b,), ks[0], ks[-1] + 1)
    onehot = jax.nn.one_hot(kk - ks[0], len(ks), dtype=x.dtype)
    return jnp.einsum("kbhwc,bk->bhwc", outs, onehot)


def _med3(a, b, c):
    return jnp.maximum(jnp.minimum(a, b), jnp.minimum(jnp.maximum(a, b), c))


def _med5(a, b, c, d, e):
    f = jnp.maximum(jnp.minimum(a, b), jnp.minimum(c, d))
    g = jnp.minimum(jnp.maximum(a, b), jnp.maximum(c, d))
    return _med3(e, f, g)


def _median3x3(x):
    """Exact 3x3 median via the 19-exchange min/max network (a general
    25/9-way jnp.sort costs ~3 ms on TPU; this is pure fusable VPU work)."""
    b, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    v = [xp[:, i:i + h, j:j + w] for i in range(3) for j in range(3)]

    def cx(i, j):
        lo = jnp.minimum(v[i], v[j])
        hi = jnp.maximum(v[i], v[j])
        v[i], v[j] = lo, hi

    # the classic 19-exchange median-of-9 network (min lands at i, max at j;
    # the final exchanges are DIRECTIONAL — (4,2) is not (2,4))
    for i, j in ((1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2),
                 (4, 5), (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4),
                 (2, 5), (4, 7), (4, 2), (6, 4), (4, 2)):
        cx(i, j)
    return v[4]


def _axis_taps(x, k, axis):
    """k edge-padded shifted views of x along one spatial axis."""
    r = k // 2
    pad = [(0, 0)] * 4
    pad[axis] = (r, r)
    xp = jnp.pad(x, pad, mode="edge")
    n = x.shape[axis]
    taps = []
    for t in range(k):
        s = [slice(None)] * 4
        s[axis] = slice(t, t + n)
        taps.append(xp[tuple(s)])
    return taps


def _median5_axis(x, axis):
    """5-tap median along one spatial axis (7 min/max ops)."""
    return _med5(*_axis_taps(x, 5, axis))


def _med7(*v):
    """Median of 7 via Devillard's 13-exchange network ("Fast median search:
    an ANSI C implementation", opt_med7) — pure fusable VPU min/max work."""
    v = list(v)
    for i, j in ((0, 5), (0, 3), (1, 6), (2, 4), (0, 1), (3, 5), (2, 6),
                 (2, 3), (3, 6), (4, 5), (1, 4), (1, 3), (3, 4)):
        lo = jnp.minimum(v[i], v[j])
        hi = jnp.maximum(v[i], v[j])
        v[i], v[j] = lo, hi
    return v[3]


def _median7_axis(x, axis):
    """7-tap median along one spatial axis (13 min/max ops)."""
    return _med7(*_axis_taps(x, 7, axis))


def op_median_blur(key, x):
    """iaa.MedianBlur(k=(3, 7)): per-sample k drawn from {3..7} with even
    draws bumped to the next odd (imgaug/cv2 medians need odd k), so the
    effective mix is P(3)=0.2, P(5)=0.4, P(7)=0.4. k=3 is the exact 2-D
    median (19-exchange network); k=5/k=7 are SEPARABLE medians (row medians
    then column medians via 7/13-exchange networks — documented
    approximation of the full 2-D median, PARITY.md)."""
    b = x.shape[0]
    kk = jax.random.randint(key, (b,), 3, 8)
    kk = kk + (kk % 2 == 0)                           # even -> next odd
    m3 = _median3x3(x)
    m5 = _median5_axis(_median5_axis(x, 2), 1)
    m7 = _median7_axis(_median7_axis(x, 2), 1)
    outs = jnp.stack([m3, m5, m7])                    # (3, B, H, W, C)
    onehot = jax.nn.one_hot((kk - 3) // 2, 3, dtype=x.dtype)
    return jnp.einsum("kbhwc,bk->bhwc", outs, onehot)


def motion_blur_kernel(angle_deg: jnp.ndarray, direction: jnp.ndarray,
                       k: int = 5) -> jnp.ndarray:
    """Per-sample k x k motion-blur kernels, imgaug construction.

    imgaug's MotionBlur (``imgaug/augmenters/blur.py``) builds a k x k matrix
    whose center column is ``linspace(d, 1 - d, k)`` with
    ``d = (clip(direction, -1, 1) + 1) / 2``, **quantizes it to uint8**
    (``(matrix * 255).astype(uint8)``), rotates it by ``angle`` with bilinear
    (order=1) interpolation and zero fill — the warp of a uint8 image, so the
    rotated kernel is **rounded back to uint8** — then ``/255`` and
    normalizes by the sum. The bilinear rotation of that single-column image
    has a closed form: ``K[i, j] = tri(sx) * sum_y w_y * tri(sy - y)`` with
    ``(sy, sx)`` the inverse-rotated cell offset and
    ``tri(t) = max(0, 1 - |t|)`` — evaluated here for all k*k cells at once,
    no resampling loop, with both uint8 quantization steps reproduced
    (``floor`` going in, ``round`` coming out of the warp; ADVICE r4 #1).

    angle_deg, direction: (B,) -> kernels (B, k, k), each summing to 1.
    """
    r = k // 2
    d = (jnp.clip(direction, -1.0, 1.0) + 1.0) / 2.0            # (B,)
    wline = d[:, None] + (1.0 - 2.0 * d[:, None]) * (
        jnp.arange(k, dtype=angle_deg.dtype) / (k - 1))          # (B, k)
    # imgaug: (matrix * 255).astype(uint8) BEFORE the rotation (truncation;
    # the tiny eps absorbs float32 representation error at exact multiples)
    wline = jnp.floor(wline * 255.0 + 1e-3) / 255.0
    theta = angle_deg * (jnp.pi / 180.0)
    c, s = jnp.cos(theta)[:, None, None], jnp.sin(theta)[:, None, None]
    cy, cx = jnp.meshgrid(jnp.arange(k, dtype=angle_deg.dtype) - r,
                          jnp.arange(k, dtype=angle_deg.dtype) - r,
                          indexing="ij")                         # (k, k)
    sy = c * cy - s * cx                                         # (B, k, k)
    sx = s * cy + c * cx

    def tri(t):
        return jnp.maximum(0.0, 1.0 - jnp.abs(t))

    # column weight at offset y-r for each line row y: (B, k, k, k) is tiny
    row = jnp.sum(wline[:, None, None, :]
                  * tri(sy[..., None] - (jnp.arange(k, dtype=sy.dtype) - r)),
                  axis=-1)
    kern = tri(sx) * row
    # imgaug's Affine.augment_image returns uint8: the bilinearly
    # interpolated taps are rounded to the 1/255 grid before normalization
    kern = jnp.round(kern * 255.0) / 255.0
    return kern / jnp.sum(kern, axis=(1, 2), keepdims=True)


def op_motion_blur(key, x, k=5):
    """iaa.MotionBlur(k=5, angle=(0, 360), direction=(-1.0, 1.0)): per-sample
    rotated 5x5 line kernel (``motion_blur_kernel``) applied as 25 shifted
    multiply-adds with edge padding (imgaug/cv2.filter2D uses reflect-101;
    at 32x128 the border rows differ only in the outermost pixel ring)."""
    b, h, w, _ = x.shape
    k1, k2 = jax.random.split(key)
    angle = jax.random.uniform(k1, (b,), minval=0.0, maxval=360.0)
    direction = jax.random.uniform(k2, (b,), minval=-1.0, maxval=1.0)
    kern = motion_blur_kernel(angle, direction, k).astype(x.dtype)
    r = k // 2
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)), mode="edge")
    out = jnp.zeros_like(x)
    for i in range(k):
        for j in range(k):
            out = out + kern[:, i, j, None, None, None] \
                * xp[:, i:i + h, j:j + w]
    return out


def bilateral_filter(x: jnp.ndarray, sigma_color: jnp.ndarray,
                     sigma_space: jnp.ndarray, radius=2,
                     max_radius: int = None) -> jnp.ndarray:
    """True bilateral filter with cv2 semantics on a disc window.

    cv2.bilateralFilter(d=2*radius+1): taps with ``dy^2+dx^2 > radius^2`` are
    excluded (circular support); color distance is the cross-channel L1 sum
    in 8-bit units; weights ``exp(-d^2 / (2 sigma^2))``. Implemented as
    shifted compare-sums — no gathers (13 taps at radius 2, 81 at radius 5).

    ``radius`` may be a per-sample (B, 1, 1, 1) int array (cv2's
    ``radius = d // 2``); then ``max_radius`` bounds the static tap loop and
    each tap is masked per sample (``dy^2+dx^2 <= radius^2``), reproducing
    imgaug's sampled-d BilateralBlur in one batched pass.

    On TPU the tap loop runs as a Pallas kernel (one VMEM-resident pass per
    sample, :func:`_bilateral_pallas` — the XLA loop re-streams the padded
    image from HBM per tap); the XLA path below is the reference
    implementation and the CPU/grad path. Equality asserted in
    ``test_bilateral_pallas_matches_xla``.

    x: (B, H, W, C) float [0,1]; sigmas: (B, 1, 1, 1) in 8-bit/pixel units.
    """
    b, h, w, _ = x.shape
    per_sample = not isinstance(radius, int)
    r = int(max_radius) if per_sample else radius
    rad2 = ((radius * radius).astype(x.dtype) if per_sample
            else jnp.full((b, 1, 1, 1), float(r * r), x.dtype))
    if jax.default_backend() == "tpu" and x.shape[-1] == 3:
        return _bilateral_pallas(x, sigma_color, sigma_space, rad2, r)
    gc = -0.5 / (sigma_color * sigma_color)
    gs = -0.5 / (sigma_space * sigma_space)
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)), mode="edge")
    num = jnp.zeros_like(x)
    den = jnp.zeros((b, h, w, 1), x.dtype)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            d2 = dy * dy + dx * dx
            if d2 > r * r:
                continue  # cv2's circular window (static bound)
            nb = xp[:, r + dy:r + dy + h, r + dx:r + dx + w]
            cd = jnp.sum(jnp.abs(nb - x), axis=-1, keepdims=True) * 255.0
            wgt = jnp.exp(gc * cd * cd + gs * float(d2))
            if per_sample and d2 > 0:
                wgt = wgt * (float(d2) <= rad2)
            num = num + wgt * nb
            den = den + wgt
    return num / den


def _bilateral_pallas(x: jnp.ndarray, sigma_color: jnp.ndarray,
                      sigma_space: jnp.ndarray, rad2: jnp.ndarray,
                      r: int) -> jnp.ndarray:
    """Pallas bilateral: grid over batch, each program filters one sample's
    3 channel planes entirely in VMEM (81 shifted-slice taps at r=5 touch
    ~120 KB instead of 81 HBM re-reads of the padded image). Same math as
    the XLA loop in :func:`bilateral_filter`, tap for tap."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, _ = x.shape
    hp, wp = h + 2 * r, w + 2 * r
    xp = jnp.moveaxis(jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)),
                              mode="edge"), -1, 1)          # (B, 3, Hp, Wp)
    gc_a = (-0.5 / (sigma_color * sigma_color)).reshape(b).astype(jnp.float32)
    gs_a = (-0.5 / (sigma_space * sigma_space)).reshape(b).astype(jnp.float32)
    r2_a = rad2.reshape(b).astype(jnp.float32)

    def kernel(gc_ref, gs_ref, r2_ref, xp_ref, out_ref):
        i = pl.program_id(0)
        gc = gc_ref[i]
        gs = gs_ref[i]
        rr2 = r2_ref[i]
        ctr = xp_ref[0, :, r:r + h, r:r + w]                # (3, H, W)
        num = jnp.zeros((3, h, w), jnp.float32)
        den = jnp.zeros((1, h, w), jnp.float32)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                d2 = dy * dy + dx * dx
                if d2 > r * r:
                    continue
                nb = xp_ref[0, :, r + dy:r + dy + h, r + dx:r + dx + w]
                cd = jnp.sum(jnp.abs(nb - ctr), axis=0,
                             keepdims=True) * 255.0
                # per-sample disc mask folded into the exp argument as a
                # SCALAR -inf (one select on a scalar beats a vector mul)
                s = jnp.where(float(d2) <= rr2, gs * float(d2),
                              jnp.float32(-1e30)) if d2 > 0 else jnp.float32(0)
                wgt = jnp.exp(gc * cd * cd + s)
                num = num + wgt * nb
                den = den + wgt
        out_ref[0] = num / den

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            # whole (B,) scalar vectors in SMEM (rank-1 blocks must equal the
            # array dim); each program reads its own entry by program_id
            pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, hp, wp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, h, w), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(gc_a, gs_a, r2_a, xp.astype(jnp.float32))
    return jnp.moveaxis(out, 1, -1).astype(x.dtype)


def op_bilateral_blur(key, x):
    """iaa.BilateralBlur(d=(3,10), sigma_color=(10,250), sigma_space=(10,250))
    as a TRUE bilateral filter (``bilateral_filter``, cv2-anchored test) with
    the per-sample diameter draw d ~ DiscreteUniform(3, 10) and cv2's
    ``radius = d // 2`` window (so radius ∈ {1, 2, 2, 3, 3, 4, 4, 5})."""
    k1, k2, k3 = jax.random.split(key, 3)
    b = x.shape[0]
    sc = _u(k1, b, 10.0, 250.0)
    ss = _u(k2, b, 10.0, 250.0)
    d = jax.random.randint(k3, (b, 1, 1, 1), 3, 11)
    return bilateral_filter(x, sc, ss, radius=d // 2, max_radius=5)


BLUR_KINDS: List[Op] = [op_gaussian_blur, op_average_blur, op_median_blur,
                        op_motion_blur]


def blur_family(key, x, kinds: Sequence[Op] = None):
    """OneOf([Sharpen, OneOf([blur kinds])]) (augmentation_pipelines.py:164)."""
    kinds = list(kinds) if kinds is not None else BLUR_KINDS + [op_bilateral_blur]
    k1, k2, k3 = jax.random.split(key, 3)
    sharp = op_sharpen(k1, x)
    blur = one_of(k2, x, kinds)
    use_sharp = jax.random.bernoulli(k3, 0.5, (x.shape[0], 1, 1, 1))
    return jnp.where(use_sharp, sharp, blur)


# ------------------------------------------------------------------ contrast
# (augmentation_pipelines.py:179-188)

def op_gamma_contrast(key, x):
    """iaa.GammaContrast((0.5, 2.0))."""
    gamma = _u(key, x.shape[0], 0.5, 2.0)
    return jnp.clip(x, 0, 1) ** gamma


def op_linear_contrast(key, x):
    """iaa.LinearContrast((0.5, 1.0)): 127.5 + alpha*(I - 127.5)."""
    alpha = _u(key, x.shape[0], 0.5, 1.0)
    return jnp.clip(0.5 + alpha * (x - 0.5), 0, 1)


def op_sigmoid_contrast(key, x):
    """iaa.SigmoidContrast(gain=(3,10), cutoff=(0.4,0.6))."""
    k1, k2 = jax.random.split(key)
    b = x.shape[0]
    gain = _u(k1, b, 3.0, 10.0)
    cutoff = _u(k2, b, 0.4, 0.6)
    return 1.0 / (1.0 + jnp.exp(gain * (cutoff - x)))


def op_log_contrast(key, x):
    """iaa.LogContrast(gain=(0.6, 1.4)): gain * log2(1 + I)."""
    gain = _u(key, x.shape[0], 0.6, 1.4)
    return jnp.clip(gain * jnp.log2(1.0 + x), 0, 1)


def _equalize(v: jnp.ndarray) -> jnp.ndarray:
    """Exact 256-bin histogram equalization of (B, H, W) values in [0,1].

    Histogram and LUT lookup are both one-hot matmuls (MXU work) — vmapped
    bincount lowers to per-image scatter-adds and the LUT lookup to gathers,
    both pathologically slow on TPU."""
    b, h, w = v.shape
    bins = jnp.clip((v * 255.0).astype(jnp.int32), 0, 255).reshape(b, -1)
    oh = jax.nn.one_hot(bins, 256, dtype=jnp.float32)      # (B, P, 256)
    hist = oh.sum(axis=1)
    cdf = jnp.cumsum(hist, axis=-1)
    cdf_min = jnp.take_along_axis(
        cdf, jnp.argmax(hist > 0, axis=-1)[:, None], axis=1)
    denom = jnp.maximum(cdf[:, -1:] - cdf_min, 1.0)
    lut = jnp.clip((cdf - cdf_min) / denom, 0, 1)          # (B, 256)
    out = jnp.einsum("bpk,bk->bp", oh, lut)                # LUT via matmul
    return out.reshape(b, h, w)


def op_histogram_equalization(key, x):
    """iaa.HistogramEqualization(): equalize luminance, rescale RGB by the
    luminance ratio (the reference equalizes L of Lab)."""
    del key
    y = _luma(x)[..., 0]
    y_eq = _equalize(y)
    ratio = (y_eq / jnp.maximum(y, 1e-3))[..., None]
    return jnp.clip(x * ratio, 0, 1)


def op_allchannels_histogram_equalization(key, x):
    """iaa.AllChannelsHistogramEqualization(): per-RGB-channel equalize."""
    del key
    chans = [_equalize(x[..., c]) for c in range(3)]
    return jnp.stack(chans, axis=-1)


def clahe_gray(v: jnp.ndarray, clip_limit: jnp.ndarray,
               grid=(8, 8)) -> jnp.ndarray:
    """REAL tiled CLAHE with cv2 semantics (cv2-anchored test).

    v: (B, H, W) in [0,1]; clip_limit: (B,) (cv2's clipLimit units).
    8x8 tile grid: per-tile 256-bin histogram (one-hot matmul, no scatters),
    cv2's exact clip + excess redistribution (batch increment + stepped
    residual bins), LUT = round(cdf * 255 / tile_area), and bilinear
    interpolation between the 4 neighboring tile LUTs per pixel — the LUT
    lookup and the tile interpolation are einsums against the pixel one-hot,
    so the whole op is matmul/VPU work.
    """
    b, h, w = v.shape
    gh, gw = grid
    th, tw = h // gh, w // gw
    assert th * gh == h and tw * gw == w, (h, w, grid)
    area = float(th * tw)
    n_tiles = gh * gw
    bins = jnp.clip(jnp.round(v * 255.0).astype(jnp.int32), 0, 255)
    tiles = bins.reshape(b, gh, th, gw, tw).transpose(0, 1, 3, 2, 4)
    tiles = tiles.reshape(b, n_tiles, th * tw)
    oh_t = jax.nn.one_hot(tiles, 256, dtype=jnp.float32)  # (B, T, area, 256)
    hist = oh_t.sum(axis=2)                               # (B, T, 256)

    # cv2: clipLimit_ = max(int(clipLimit * area / 256), 1) — C truncation
    clip = jnp.maximum(jnp.floor(clip_limit[:, None, None] * area / 256.0), 1.0)
    excess = jnp.sum(jnp.maximum(hist - clip, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, clip)
    batch_incr = jnp.floor(excess / 256.0)
    residual = excess - batch_incr * 256.0
    hist = hist + batch_incr
    # cv2 residual loop: step = max(256 // residual, 1); bins 0, step, 2*step,
    # ... get +1 until the residual is used up
    step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(residual, 1.0)), 1.0)
    iota = jnp.arange(256, dtype=jnp.float32)
    bump = ((jnp.mod(iota, step) == 0.0)
            & (jnp.floor(iota / step) < residual)).astype(jnp.float32)
    hist = hist + bump

    cdf = jnp.cumsum(hist, axis=-1)
    lut = jnp.clip(jnp.round(cdf * (255.0 / area)), 0.0, 255.0)  # (B, T, 256)

    # per-pixel LUT value for EVERY tile, then static bilinear tile weights
    oh_p = jax.nn.one_hot(bins.reshape(b, -1), 256, dtype=jnp.float32)
    vals = jnp.einsum("bpk,btk->bpt", oh_p, lut)          # (B, H*W, T)

    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    tyf = ys / th - 0.5
    txf = xs / tw - 0.5
    y0 = np.floor(tyf).astype(np.int64)
    x0 = np.floor(txf).astype(np.int64)
    fy = (tyf - y0).astype(np.float32)
    fx = (txf - x0).astype(np.float32)
    wmat = np.zeros((h * w, n_tiles), np.float32)
    flat = np.arange(h * w)
    for oy, wy in ((0, 1.0 - fy), (1, fy)):
        for ox, wx in ((0, 1.0 - fx), (1, fx)):
            ty = np.clip(y0 + oy, 0, gh - 1)
            tx = np.clip(x0 + ox, 0, gw - 1)
            np.add.at(wmat, (flat, (ty * gw + tx).ravel()),
                      (wy * wx).ravel())
    out = jnp.einsum("bpt,pt->bp", vals, jnp.asarray(wmat))
    return jnp.clip(jnp.round(out), 0.0, 255.0).reshape(b, h, w) / 255.0


def op_clahe(key, x):
    """iaa.CLAHE(clip_limit=(0.1, 8), 8x8 tiles): real tiled CLAHE
    (``clahe_gray``) on the Lab L channel, matching imgaug's default
    ``to_colorspace=Lab`` path end-to-end: cv2's RGB->Lab 8-bit conversion
    (L scaled x255/100, a/b offset +128, all three rounded to uint8 exactly
    as imgaug's colorspace roundtrip does), cv2 CLAHE on the 8-bit L plane,
    then Lab->RGB back (cv2-anchored in test_clahe_lab_matches_cv2)."""
    b = x.shape[0]
    clip_limit = jax.random.uniform(key, (b,), minval=0.1, maxval=8.0)
    lum, a_ch, b_ch = _rgb_to_lab(x)
    l8 = jnp.clip(jnp.round(lum * (255.0 / 100.0)), 0.0, 255.0)
    a8 = jnp.clip(jnp.round(a_ch + 128.0), 0.0, 255.0)
    b8 = jnp.clip(jnp.round(b_ch + 128.0), 0.0, 255.0)
    l_eq = clahe_gray(l8 / 255.0, clip_limit) * 255.0   # 8-bit exact
    return _lab_to_rgb(l_eq * (100.0 / 255.0), a8 - 128.0, b8 - 128.0)


def op_allchannels_clahe(key, x):
    """iaa.AllChannelsCLAHE(clip_limit=(0.1, 8)): real tiled CLAHE applied to
    each RGB channel independently (cv2 semantics, cv2-anchored test)."""
    b, h, w, _ = x.shape
    clip_limit = jax.random.uniform(key, (b,), minval=0.1, maxval=8.0)
    # one batched clahe_gray over (3B, H, W) — channel-as-batch, so the
    # tiled-histogram machinery runs once instead of three times
    xc = jnp.moveaxis(x, -1, 1).reshape(3 * b, h, w)
    out = clahe_gray(xc, jnp.repeat(clip_limit, 3))
    return jnp.moveaxis(out.reshape(b, 3, h, w), 1, -1)


CONTRAST_OPS: List[Op] = [
    op_gamma_contrast, op_linear_contrast, op_sigmoid_contrast,
    op_log_contrast, op_histogram_equalization,
    op_allchannels_histogram_equalization, op_clahe, op_allchannels_clahe,
]


# ------------------------------------------------------------------ weather
# (augmentation_pipelines.py:189-202)

def op_fog(key, x):
    """iaa.Fog(): blend toward white with a smooth density field."""
    k1, k2 = jax.random.split(key)
    b, h, w, _ = x.shape
    field = _smooth_field(k1, b, h, w, octaves=((2, 4), (4, 8)), method="cubic")
    density = jnp.clip(field * 0.5 + _u(k2, b, 0.3, 0.7), 0, 1)
    return x * (1 - density) + 1.0 * density


def op_clouds(key, x):
    """iaa.Clouds(): additive bright low-frequency layer."""
    k1, k2 = jax.random.split(key)
    b, h, w, _ = x.shape
    field = jnp.clip(_smooth_field(k1, b, h, w, octaves=((2, 6), (4, 12)),
                                   method="cubic"), 0, None)
    amp = _u(k2, b, 0.2, 0.5)
    return jnp.clip(x + field * amp, 0, 1)


def op_snowflakes(key, x):
    """iaa.Snowflakes(flake_size=(0.1,0.4), speed=(0.01,0.05)): sparse white
    flakes with short fall streaks."""
    k1, k2, k3 = jax.random.split(key, 3)
    b, h, w, _ = x.shape
    density = _u(k1, b, 0.005, 0.03)
    flakes = (jax.random.uniform(k2, (b, h, w, 1)) < density).astype(x.dtype)
    # short vertical streak (speed): 3-tap smear downward
    fp = jnp.pad(flakes, ((0, 0), (2, 0), (0, 0), (0, 0)))
    streak = jnp.clip(fp[:, 2:] + 0.7 * fp[:, 1:h + 1] + 0.4 * fp[:, :h], 0, 1)
    strength = _u(k3, b, 0.5, 0.9)
    return jnp.clip(x + streak * strength, 0, 1)


def op_rain(key, x):
    """iaa.Rain(speed=(0.1,0.3)): sparse diagonal bright streaks."""
    k1, k2, k3 = jax.random.split(key, 3)
    b, h, w, _ = x.shape
    density = _u(k1, b, 0.002, 0.01)
    drops = (jax.random.uniform(k2, (b, h, w, 1)) < density).astype(x.dtype)
    dp = jnp.pad(drops, ((0, 0), (4, 0), (0, 4), (0, 0)))
    streak = sum(dp[:, 4 - t:4 - t + h, 4 - t:4 - t + w] * (1 - 0.18 * t)
                 for t in range(5))
    streak = jnp.clip(streak, 0, 1)
    alpha = _u(k3, b, 0.3, 0.6)
    return jnp.clip(x + streak * alpha * 0.7, 0, 1)


WEATHER_OPS: List[Op] = [op_fog, op_clouds, op_snowflakes, op_rain]


# ------------------------------------------------------------------ misc

def op_channel_shuffle(key, x, p=0.35):
    """iaa.ChannelShuffle(0.35): with prob p permute RGB channels.

    Applied as a one-hot (B,3,3) permutation-matrix einsum, NOT a
    take_along_axis: the gather form emits B*H*W*3 offset rows (~3 ms on
    TPU per the README op-selection rules) while the matmul is free inside
    the surrounding fusion."""
    k1, k2 = jax.random.split(key)
    b = x.shape[0]
    perm = jnp.argsort(jax.random.uniform(k1, (b, 3)), axis=-1)  # (B, 3)
    pmat = jax.nn.one_hot(perm, 3, dtype=x.dtype)                # (B, 3, 3)
    # HIGHEST: 0/1 weights must select exactly (a bf16-pass matmul would
    # round the fp32 pixel values)
    shuffled = jnp.einsum("bhwc,bkc->bhwk", x, pmat,
                          precision=jax.lax.Precision.HIGHEST)
    gate = jax.random.bernoulli(k2, p, (b, 1, 1, 1))
    return jnp.where(gate, shuffled, x)
