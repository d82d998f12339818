"""Per-op tests for the device-side imgaug equivalents (aug_ops.py).

Each reference op family gets a behavioral/statistical check; the JPEG op is
measured against real libjpeg output (PIL), and the convolution/blur ops
against scipy ground truth on the interior (border handling differs by
design — edge vs reflect padding, documented in aug_ops.py).
"""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccd_tpu.data import aug_ops as A
from ccd_tpu.data.augment import photometric_augment, supervised_augment

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    base = rng.random((6, 32, 128, 3)).astype(np.float32)
    # add structure (text-like strokes) so edge/blur ops have signal
    base[:, 10:22, 20:40] = 0.05
    base[:, 12:20, 60:100] = 0.9
    return jnp.asarray(base)


def test_one_of_selects_exactly_one(imgs):
    ops = [lambda k, x: jnp.zeros_like(x), lambda k, x: jnp.ones_like(x)]
    out = np.asarray(A.one_of(KEY, imgs, ops))
    per_sample = out.reshape(out.shape[0], -1)
    assert all(np.all(row == row[0]) and row[0] in (0.0, 1.0)
               for row in per_sample)


def test_sometimes_gate_rate():
    x = jnp.zeros((4000, 2, 2, 3))
    out = np.asarray(A.sometimes(KEY, x, 0.3, lambda k, y: y + 1.0))
    rate = (out.reshape(4000, -1).max(1) > 0).mean()
    assert 0.25 < rate < 0.35


def test_invert_internal_probability():
    big = jnp.full((3000, 2, 2, 3), 0.25)
    out = np.asarray(A.op_invert(KEY, big))
    inv = np.isclose(out, 0.75).all(axis=(1, 2, 3))
    same = np.isclose(out, 0.25).all(axis=(1, 2, 3))
    assert (inv | same).all()
    assert 0.10 < inv.mean() < 0.20  # iaa.Invert(0.15)


def test_solarize_semantics(imgs):
    out = np.asarray(A.op_solarize(jax.random.PRNGKey(3), imgs, p=1.0))
    x = np.asarray(imgs)
    for i in range(x.shape[0]):
        changed = ~np.isclose(out[i], x[i])
        if changed.any():
            # every changed pixel is an inversion of a bright pixel
            assert np.allclose(out[i][changed], 1.0 - x[i][changed], atol=1e-6)
            assert x[i][changed].min() >= 32 / 255 - 1e-6


def test_jpeg_matches_real_libjpeg(imgs):
    """Our blockwise-DCT op must approximate PIL/libjpeg at the same quality:
    closer to the real JPEG output than the original is."""
    from PIL import Image
    x = np.asarray(imgs[0])
    q = 15  # compression 85, inside the op's (70, 99) range
    ours = np.asarray(A.op_jpeg_compression(
        KEY, imgs[:1], compression=(100 - q, 100.001 - q)))[0]
    buf = io.BytesIO()
    Image.fromarray((x * 255).astype(np.uint8)).save(buf, "JPEG", quality=q)
    pil = np.asarray(Image.open(buf), np.float32) / 255.0
    mse_ours_pil = float(np.mean((ours - pil) ** 2))
    mse_orig_pil = float(np.mean((x - pil) ** 2))
    assert mse_ours_pil < 0.6 * mse_orig_pil  # artifacts track real JPEG
    assert float(np.mean((ours - x) ** 2)) > 1e-5  # and are actually present


def test_hsv_roundtrip(imgs):
    back = np.asarray(A._hsv_to_rgb(A._rgb_to_hsv(imgs)))
    np.testing.assert_allclose(back, np.asarray(imgs), atol=1e-5)


def test_grayscale_alpha_bounds(imgs):
    out = np.asarray(A.op_grayscale(jax.random.PRNGKey(1), imgs))
    x = np.asarray(imgs)
    luma = (0.299 * x[..., :1] * 0 + np.asarray(A._luma(imgs)))
    # output is a convex blend: between original and luma per channel
    lo = np.minimum(x, np.broadcast_to(luma, x.shape))
    hi = np.maximum(x, np.broadcast_to(luma, x.shape))
    assert (out >= lo - 1e-5).all() and (out <= hi + 1e-5).all()


def test_median_blur_matches_scipy(imgs):
    """k=3 median is the exact 2-D median (network-verified vs scipy);
    k=5/k=7 are separable medians (row then column medians) — verified
    against the equivalent two-pass scipy filters. Every sample must match
    exactly one of the three candidates (the imgaug draw {3,5,5,7,7})."""
    from scipy import ndimage as ndi
    x = np.asarray(imgs)
    med = np.asarray(A.op_median_blur(jax.random.PRNGKey(7), imgs))
    interior = (slice(4, -4), slice(4, -4))
    for i in range(x.shape[0]):
        refs = [np.stack([ndi.median_filter(x[i, ..., c], size=3)
                          for c in range(3)], -1)]
        for k in (5, 7):
            refs.append(np.stack([
                ndi.median_filter(ndi.median_filter(x[i, ..., c], size=(1, k)),
                                  size=(k, 1)) for c in range(3)], -1))
        assert any(np.allclose(med[i][interior], r[interior], atol=1e-4)
                   for r in refs), f"median sample {i}"


def test_median7_network_is_true_median():
    """Devillard's 13-exchange median-of-7 network vs np.median, fuzzed."""
    rng = np.random.default_rng(11)
    v = rng.random((7, 4096)).astype(np.float32)
    got = np.asarray(A._med7(*[jnp.asarray(r) for r in v]))
    np.testing.assert_array_equal(got, np.median(v, axis=0))


def test_average_blur_matches_cv2_all_k(imgs):
    """op_average_blur vs cv2.blur for every k in {2..6} — including the
    EVEN kernels and their anchor-at-k//2 half-pixel phase. Each sample
    must match exactly the cv2 result for its drawn k, and all five ks
    must occur across a larger batch."""
    import cv2
    rng = np.random.default_rng(5)
    x = rng.random((64, 32, 64, 3)).astype(np.float32)
    avg = np.asarray(A.op_average_blur(jax.random.PRNGKey(7), jnp.asarray(x)))
    interior = (slice(4, -4), slice(4, -4))
    seen = set()
    for i in range(x.shape[0]):
        matched = None
        for k in (2, 3, 4, 5, 6):
            ref = cv2.blur(x[i], (k, k))
            if np.allclose(avg[i][interior], ref[interior], atol=1e-5):
                matched = k
                break
        assert matched is not None, f"average sample {i} matches no cv2 k"
        seen.add(matched)
    assert seen == {2, 3, 4, 5, 6}, f"ks drawn: {seen}"


def test_bilateral_sampled_d_matches_cv2(imgs):
    """bilateral_filter with per-sample radius (cv2 d//2) vs
    cv2.bilateralFilter at d ∈ {3, 6, 9} — the sampled-d path of
    op_bilateral_blur (VERDICT r4 #7)."""
    import cv2
    u8 = np.asarray(np.round(np.asarray(imgs) * 255.0), np.uint8)
    sc, ss = 75.0, 40.0
    b = u8.shape[0]
    for d in (3, 6, 9):
        rad = np.full((b, 1, 1, 1), d // 2, np.int32)
        ours = np.asarray(A.bilateral_filter(
            jnp.asarray(u8.astype(np.float32) / 255.0),
            jnp.full((b, 1, 1, 1), sc), jnp.full((b, 1, 1, 1), ss),
            radius=jnp.asarray(rad), max_radius=5)) * 255.0
        ref = np.stack([
            cv2.bilateralFilter(img, d=d, sigmaColor=sc, sigmaSpace=ss)
            for img in u8
        ]).astype(np.float32)
        m = d // 2 + 1
        diff = np.abs(ours - ref)[:, m:-m, m:-m]
        assert diff.max() <= 0.5 + 1e-3, (d, diff.max())


def test_bilateral_pallas_matches_xla(imgs):
    """The TPU Pallas bilateral (run here in interpret mode) must equal the
    XLA reference loop tap for tap — both the per-sample-radius and the
    fixed-radius configurations."""
    b = imgs.shape[0]
    sc = jnp.full((b, 1, 1, 1), 75.0)
    ss = jnp.full((b, 1, 1, 1), 40.0)
    rad = jnp.asarray(np.array([1, 2, 3, 4, 5, 2]).reshape(b, 1, 1, 1))
    ref = A.bilateral_filter(imgs, sc, ss, radius=rad, max_radius=5)
    got = A._bilateral_pallas(imgs, sc, ss, (rad * rad).astype(imgs.dtype), 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)
    ref2 = A.bilateral_filter(imgs, sc, ss, radius=2)
    got2 = A._bilateral_pallas(imgs, sc, ss,
                               jnp.full((b, 1, 1, 1), 4.0), 2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=2e-6)


def test_gaussian_blur_matches_scipy(imgs):
    from scipy import ndimage as ndi
    sigma = jnp.full((6,), 1.0)
    out = np.asarray(A.gaussian_blur(imgs, sigma))
    x = np.asarray(imgs)
    ref = np.stack([np.stack([ndi.gaussian_filter(x[i, ..., c], 1.0, truncate=2.0)
                              for c in range(3)], -1) for i in range(6)])
    interior = (slice(None), slice(3, -3), slice(3, -3))
    np.testing.assert_allclose(out[interior], ref[interior], atol=0.02)


def test_quantization_levels(imgs):
    out = np.asarray(A.op_uniform_color_quantization(jax.random.PRNGKey(2), imgs))
    for i in range(out.shape[0]):
        for c in range(3):
            assert len(np.unique(out[i, ..., c])) <= 16
    km = np.asarray(A.op_kmeans_color_quantization(jax.random.PRNGKey(2), imgs))
    for i in range(km.shape[0]):
        colors = np.unique(km[i].reshape(-1, 3), axis=0)
        assert len(colors) <= 16


def test_channel_shuffle_is_permutation(imgs):
    out = np.asarray(A.op_channel_shuffle(jax.random.PRNGKey(5), imgs, p=1.0))
    x = np.asarray(imgs)
    from itertools import permutations
    for i in range(x.shape[0]):
        assert any(np.allclose(out[i], x[i][..., list(p)])
                   for p in permutations(range(3)))


def test_dropout2d_keeps_a_channel(imgs):
    out = np.asarray(A.op_dropout2d(jax.random.PRNGKey(9), imgs))
    x = np.asarray(imgs)
    for i in range(x.shape[0]):
        kept = [c for c in range(3) if np.allclose(out[i, ..., c], x[i, ..., c])]
        zeroed = [c for c in range(3) if (out[i, ..., c] == 0).all()]
        assert len(kept) >= 1 and len(kept) + len(zeroed) == 3


def test_color_temperature_direction(imgs):
    # force a warm temperature (~1500K): blue must drop far more than red
    warm = np.asarray(A._kelvin_to_rgb(jnp.asarray([1500.0])))[0]
    assert warm[0] > 0.95 and warm[2] < 0.2
    cold = np.asarray(A._kelvin_to_rgb(jnp.asarray([10000.0])))[0]
    assert cold[2] > 0.9


def test_contrast_formulas(imgs):
    x = np.asarray(imgs)
    out = np.asarray(A.op_sigmoid_contrast(jax.random.PRNGKey(11), imgs))
    assert out.min() >= 0 and out.max() <= 1
    # log contrast exact formula with known gain: monkey-free check via range
    lg = np.asarray(A.op_log_contrast(jax.random.PRNGKey(12), imgs))
    assert lg.min() >= 0 and lg.max() <= 1
    eq = np.asarray(A.op_allchannels_histogram_equalization(KEY, imgs))
    # equalized channel is ~uniform: central quantile spread close to uniform
    for c in range(3):
        v = np.sort(eq[0, ..., c].ravel())
        q25, q75 = v[len(v) // 4], v[3 * len(v) // 4]
        assert 0.3 < q75 - q25 < 0.7  # uniform would be 0.5


def test_weather_effects(imgs):
    x = np.asarray(imgs)
    fog = np.asarray(A.op_fog(jax.random.PRNGKey(21), imgs))
    assert fog.mean() > x.mean()  # fog whitens
    snow = np.asarray(A.op_snowflakes(jax.random.PRNGKey(22), imgs))
    assert snow.mean() >= x.mean() and (snow >= x - 1e-6).all()
    rain = np.asarray(A.op_rain(jax.random.PRNGKey(23), imgs))
    assert rain.mean() >= x.mean()


def test_edge_ops_alpha_zero_near_identity(imgs):
    # alpha ~ U(0,1): with a forced tiny-alpha key span the blend bound holds
    out = np.asarray(A.op_edge_detect(jax.random.PRNGKey(31), imgs))
    x = np.asarray(imgs)
    # blended output stays within [min(x, edge), max(x, edge)] => in [0,1]
    assert out.min() >= 0 and out.max() <= 1
    emb = np.asarray(A.op_emboss(jax.random.PRNGKey(32), imgs))
    assert emb.min() >= 0 and emb.max() <= 1


def test_clahe_matches_cv2(imgs):
    """clahe_gray vs cv2.createCLAHE on uint8 grayscale: same tiles, clip
    arithmetic and bilinear tile interpolation — per-pixel agreement within
    1 gray level (float-vs-int rounding in the interpolation)."""
    import cv2

    gray_u8 = np.asarray(
        np.round(np.asarray(imgs)[..., 0] * 255.0), np.uint8)
    for clip_limit in (2.0, 5.0, 40.0):
        ours = np.asarray(A.clahe_gray(
            jnp.asarray(gray_u8.astype(np.float32) / 255.0),
            jnp.full((gray_u8.shape[0],), clip_limit))) * 255.0
        ref = np.stack([
            cv2.createCLAHE(clipLimit=clip_limit,
                            tileGridSize=(8, 8)).apply(g)
            for g in gray_u8
        ]).astype(np.float32)
        diff = np.abs(ours - ref)
        assert diff.max() <= 1.0 + 1e-3, (clip_limit, diff.max())
        assert (diff > 0.5).mean() < 0.02, (clip_limit, (diff > 0.5).mean())


def test_bilateral_matches_cv2(imgs):
    """bilateral_filter vs cv2.bilateralFilter(d=5) on uint8 RGB, interior
    pixels (border mode differs: edge vs reflect)."""
    import cv2

    u8 = np.asarray(np.round(np.asarray(imgs) * 255.0), np.uint8)
    sc, ss = 75.0, 40.0
    b = u8.shape[0]
    ours = np.asarray(A.bilateral_filter(
        jnp.asarray(u8.astype(np.float32) / 255.0),
        jnp.full((b, 1, 1, 1), sc), jnp.full((b, 1, 1, 1), ss))) * 255.0
    ref = np.stack([
        cv2.bilateralFilter(img, d=5, sigmaColor=sc, sigmaSpace=ss)
        for img in u8
    ]).astype(np.float32)
    diff = np.abs(ours - ref)[:, 3:-3, 3:-3]
    # cv2 rounds to uint8; agreement within half a gray level everywhere
    assert diff.max() <= 0.5 + 1e-3, diff.max()


def test_directed_edge_kernel_matches_imgaug_formula():
    """directed_edge_kernel vs an independent numpy transcription of the
    imgaug DirectedEdgeDetect matrix construction."""
    rng = np.random.default_rng(3)
    alphas = rng.random(16).astype(np.float32)
    directions = rng.random(16).astype(np.float32)
    got = np.asarray(A.directed_edge_kernel(jnp.asarray(alphas),
                                            jnp.asarray(directions)))

    for n, (alpha, direction) in enumerate(zip(alphas, directions)):
        deg = int(direction * 360) % 360
        rad = np.deg2rad(deg)
        dvec = np.array([np.cos(rad - 0.5 * np.pi),
                         np.sin(rad - 0.5 * np.pi)])
        effect = np.zeros((3, 3))
        for yy in (-1, 0, 1):
            for xx in (-1, 0, 1):
                if xx == 0 and yy == 0:
                    continue
                cell = np.array([xx, yy], np.float64)
                cosang = np.clip(cell @ dvec / np.linalg.norm(cell), -1, 1)
                dist = np.rad2deg(np.arccos(cosang)) / 180.0
                effect[yy + 1, xx + 1] = (1.0 - dist) ** 4
        effect = effect / effect.sum()
        effect = effect * -1.0
        effect[1, 1] = 1.0
        nochange = np.zeros((3, 3))
        nochange[1, 1] = 1.0
        want = nochange * (1 - alpha) + effect * alpha
        np.testing.assert_allclose(got[n], want, atol=2e-5, err_msg=str(n))


def test_some_of_random_order_bounds():
    """SomeOf((1, None)): every sample gets at least one op; op identities
    are preserved (ops here are +1 and *2 so order matters and the result
    must be reachable by some subset/order)."""
    x = jnp.full((512, 2, 2, 3), 0.125)
    ops = [lambda k, y: y + 1.0, lambda k, y: y * 2.0]
    out = np.asarray(A.some_of_random_order(KEY, x, ops)).reshape(512, -1)
    assert np.all(out == out[:, :1])  # spatially uniform
    vals = set(np.round(out[:, 0], 4))
    # reachable: +1 -> 1.125; *2 -> 0.25; +1 then *2 -> 2.25; *2 then +1 -> 1.25
    assert vals <= {1.125, 0.25, 2.25, 1.25}, vals
    assert 0.125 not in vals  # at least one op always applies
    assert len(vals) >= 3     # subsets AND both orders occur


def test_all_severity_chains_run(imgs):
    """Severities 1/2/3/4/6 are ported chain-for-chain
    (augmentation_pipelines.py:4-121, 210-232) — each must compile, produce
    finite in-range output, and actually transform the batch."""
    for sev in (1, 2, 3, 4, 6):
        out = np.asarray(photometric_augment(jax.random.PRNGKey(sev), imgs,
                                             severity=sev))
        assert out.shape == imgs.shape
        assert np.isfinite(out).all(), sev
        assert -0.01 <= out.min() and out.max() <= 1.01, sev
        assert not np.allclose(out, np.asarray(imgs)), sev
    with pytest.raises(NotImplementedError):
        photometric_augment(KEY, imgs, severity=7)


def test_severity2_crop_geometry():
    """The severity-2 vertical crop maps the kept rows across the full
    height: cropping a horizontal stripe image moves content as cv2-resize
    of the crop would."""
    from ccd_tpu.data.augment import _op_crop
    x = jnp.zeros((4, 32, 128, 3)).at[:, :16].set(1.0)  # top half white
    out = np.asarray(_op_crop(jax.random.PRNGKey(1), x, tb=(0.25, 0.2500001),
                              lr=(0.0, 0.0)))
    # crop 8 rows top+bottom -> kept region rows 8..24, top half of which is
    # white -> output top half stays white, bottom black
    assert out[:, :14].mean() > 0.98
    assert out[:, 18:].mean() < 0.02


def test_photometric_identity_fraction():
    """iaa.Sometimes(0.2, Identity, chain): ~20% of samples unchanged.

    16x32 images (multiple of the JPEG op's 16-px block constraint) keep the
    21-candidate OneOf stacks small enough for eager CPU execution."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((600, 16, 32, 3)).astype(np.float32))
    out = np.asarray(photometric_augment(jax.random.PRNGKey(42), x))
    same = np.isclose(out, np.asarray(x), atol=1e-6).all(axis=(1, 2, 3))
    assert 0.13 < same.mean() < 0.30


def test_supervised_changes_most_samples():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((128, 16, 32, 3)).astype(np.float32))
    out = np.asarray(supervised_augment(jax.random.PRNGKey(43), x))
    same = np.isclose(out, np.asarray(x), atol=1e-6).all(axis=(1, 2, 3))
    assert same.mean() < 0.15  # five independent 0.6-0.8 stages
    assert np.isfinite(out).all()


def test_motion_blur_kernel_imgaug_construction():
    """motion_blur_kernel reproduces imgaug's rotated-line construction at
    the axis-aligned angles where the bilinear rotation is exact."""
    angles = jnp.asarray([0.0, 90.0, 180.0, 45.0])
    dirs = jnp.asarray([-1.0, 0.0, 0.5, 0.0])
    kerns = np.asarray(A.motion_blur_kernel(angles, dirs, 5))
    assert np.allclose(kerns.sum((1, 2)), 1.0, atol=1e-5)
    assert (kerns >= -1e-7).all()
    # angle=0, direction=-1 -> d=0 -> center column linspace(0, 1, 5),
    # uint8-quantized exactly as imgaug's (matrix*255).astype(uint8):
    # [0, 63, 127, 191, 255]/255, then sum-normalized (ADVICE r4 #1)
    expect = np.zeros((5, 5), np.float32)
    expect[:, 2] = np.array([0, 63, 127, 191, 255], np.float32) / 636.0
    assert np.allclose(kerns[0], expect, atol=1e-5)
    # angle=90, direction=0 -> d=0.5 -> uniform horizontal line
    expect = np.zeros((5, 5), np.float32)
    expect[2, :] = 0.2
    assert np.allclose(kerns[1], expect, atol=1e-5)
    # angle=180 == angle 0 point-reflected through the center
    k0 = np.asarray(A.motion_blur_kernel(jnp.asarray([0.0]),
                                         jnp.asarray([0.5]), 5))[0]
    assert np.allclose(kerns[2], k0[::-1, ::-1], atol=1e-5)
    # angle=45: mass lies on the anti-diagonal (bilinearly feathered), none
    # on the main diagonal's off-center cells
    assert kerns[3][2, 2] > 0.1
    assert kerns[3][1, 3] > 0.05 and kerns[3][3, 1] > 0.05
    assert abs(kerns[3][1, 1]) < 1e-6 and abs(kerns[3][3, 3]) < 1e-6


def test_motion_blur_preserves_mean(imgs):
    """Kernels sum to 1 and edge padding is mean-neutral on smooth borders."""
    out = np.asarray(A.op_motion_blur(jax.random.PRNGKey(7), imgs))
    x = np.asarray(imgs)
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    assert abs(out.mean() - x.mean()) < 0.02
    assert not np.allclose(out, x, atol=1e-4)  # it actually blurs


def test_poisson_counts_exact_distribution():
    """Inverse-CDF compare-sum draws match the exact Poisson pmf (the old
    moment-matched gaussian fails the low-lambda pmf check badly)."""
    from math import lgamma

    lams = [0.5, 7.3, 40.0]
    counts = np.asarray(A.poisson_counts(jax.random.PRNGKey(5),
                                         jnp.asarray(lams), (160, 160)))
    n = 160 * 160
    for b, lam in enumerate(lams):
        c = counts[b].ravel()
        assert abs(c.mean() - lam) < 5 * np.sqrt(lam / n) + 1e-3
        assert abs(c.var() - lam) < 0.08 * lam + 0.05
        # per-bin frequencies within 5 sigma of the exact pmf
        for k in range(0, int(lam + 4 * np.sqrt(lam)) + 1):
            p = np.exp(k * np.log(lam) - lam - lgamma(k + 1))
            if p < 1e-4:
                continue
            emp = (c == k).mean()
            assert abs(emp - p) < 5 * np.sqrt(p * (1 - p) / n) + 1e-4, \
                (lam, k, emp, p)


def test_weather_quantified_envelopes(imgs):
    """Pinned output envelopes for the procedural weather ops (PARITY.md):
    regressions in density/strength sampling are caught here."""
    x = np.asarray(imgs)
    headroom = 1.0 - x.mean(axis=(1, 2, 3))                    # per-sample

    fog = np.asarray(A.op_fog(jax.random.PRNGKey(21), imgs))
    lift = fog.mean(axis=(1, 2, 3)) - x.mean(axis=(1, 2, 3))
    assert (fog >= x - 1e-6).all()                 # pure blend toward white
    assert (lift > 0.15 * headroom).all() and (lift < 0.95 * headroom).all()

    clouds = np.asarray(A.op_clouds(jax.random.PRNGKey(25), imgs))
    assert (clouds >= x - 1e-6).all()              # additive bright layer
    clift = clouds.mean(axis=(1, 2, 3)) - x.mean(axis=(1, 2, 3))
    assert (clift < 0.5).all()

    snow = np.asarray(A.op_snowflakes(jax.random.PRNGKey(22), imgs))
    cover = (snow > x + 0.05).mean(axis=(1, 2, 3))
    assert (cover > 0.001).all() and (cover < 0.20).all()

    rain = np.asarray(A.op_rain(jax.random.PRNGKey(23), imgs))
    rcover = (rain > x + 0.05).mean(axis=(1, 2, 3))
    assert (rcover > 0.0005).all() and (rcover < 0.12).all()


def test_lab_roundtrip(imgs):
    """_lab_to_rgb inverts _rgb_to_lab (cv2 float Lab math)."""
    lum, a, b = A._rgb_to_lab(imgs)
    back = np.asarray(A._lab_to_rgb(lum, a, b))
    np.testing.assert_allclose(back, np.asarray(imgs), atol=2e-5)


def test_lab_matches_cv2(imgs):
    """_rgb_to_lab vs cv2.cvtColor(RGB2Lab) on float32 input. cv2's float
    path itself runs the sRGB gamma through an interpolated LUT (~1/64-step
    quantization, measured max dev 0.33 from the analytic formula), so the
    anchor tolerance is 0.7 Lab units — our math is the analytic formula
    cv2's LUT approximates."""
    import cv2
    x = np.asarray(imgs)
    lum, a, b = (np.asarray(v) for v in A._rgb_to_lab(imgs))
    ref = np.stack([cv2.cvtColor(img, cv2.COLOR_RGB2Lab) for img in x])
    np.testing.assert_allclose(lum, ref[..., 0], atol=0.7)
    np.testing.assert_allclose(a, ref[..., 1], atol=0.7)
    np.testing.assert_allclose(b, ref[..., 2], atol=0.7)


def test_clahe_lab_matches_cv2(imgs):
    """The op_clahe transfer (CLAHE on the Lab L plane, a/b passed through
    uint8-quantized) vs the cv2 reference pipeline imgaug runs:
    cvtColor(RGB2Lab) on uint8 -> createCLAHE().apply(L) -> cvtColor back.
    Decomposed anchors (measured): on the SAME uint8 L plane our
    ``clahe_gray`` is BIT-EXACT vs ``cv2.createCLAHE`` — asserted exactly
    below — so ALL end-to-end deviation comes from cv2's 8-bit colorspace
    conversions being fixed-point LUTs (1-2 level L shifts, which the
    histogram transfer then amplifies at sparse-bin pixels). The end-to-end
    envelope is pinned accordingly: median <= 1.5, mean <= 2.5, <3% of
    pixels beyond 8 gray levels."""
    import cv2
    u8 = np.asarray(np.round(np.asarray(imgs) * 255.0), np.uint8)
    clip_limit = 4.0
    b = u8.shape[0]
    x = jnp.asarray(u8.astype(np.float32) / 255.0)
    lum, a_ch, b_ch = A._rgb_to_lab(x)
    l8 = jnp.clip(jnp.round(lum * (255.0 / 100.0)), 0.0, 255.0)
    a8 = jnp.clip(jnp.round(a_ch + 128.0), 0.0, 255.0)
    b8 = jnp.clip(jnp.round(b_ch + 128.0), 0.0, 255.0)
    l_eq = A.clahe_gray(l8 / 255.0, jnp.full((b,), clip_limit)) * 255.0
    ours = np.asarray(A._lab_to_rgb(l_eq * (100.0 / 255.0),
                                    a8 - 128.0, b8 - 128.0)) * 255.0
    cl = cv2.createCLAHE(clipLimit=clip_limit, tileGridSize=(8, 8))
    # bit-exact CLAHE on the same L plane
    l_cv = np.stack([cl.apply(np.asarray(l8[i], np.uint8)) for i in range(b)])
    np.testing.assert_array_equal(np.asarray(l_eq), l_cv.astype(np.float32))
    refs = []
    for img in u8:
        lab = cv2.cvtColor(img, cv2.COLOR_RGB2Lab)
        lab[..., 0] = cl.apply(lab[..., 0])
        refs.append(cv2.cvtColor(lab, cv2.COLOR_Lab2RGB))
    ref = np.stack(refs).astype(np.float32)
    diff = np.abs(ours - ref)
    assert np.median(diff) <= 1.5, np.median(diff)
    assert diff.mean() <= 2.5, diff.mean()
    assert (diff > 8.0).mean() < 0.03, (diff.max(), (diff > 8.0).mean())
