"""Fused DINO-CE Pallas kernel correctness (interpret mode) vs reference loss.

The kernel auto-interprets off-TPU (``fused_dino_ce._interpret``), so no
``pallas_call`` monkeypatching is needed on the CPU test backend."""

import numpy as np

import jax
import jax.numpy as jnp

from ccd_tpu.losses import dino_char_loss
from ccd_tpu.losses.losses import dino_char_loss_fused


def _inputs(b=2, t=4, k=512, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.normal(size=(2 * b, t, k)).astype(np.float32)
    te = rng.normal(size=(2 * b, t, k)).astype(np.float32)
    c = rng.normal(size=(1, k)).astype(np.float32)
    valid = np.zeros((b, t), bool)
    valid[:, :3] = True
    return jnp.asarray(s), jnp.asarray(te), jnp.asarray(valid), jnp.asarray(c)


def test_fused_matches_reference_value():
    s, te, valid, c = _inputs()
    ref = float(dino_char_loss(s, te, valid, c, 0.04))
    fused = float(dino_char_loss_fused(s, te, valid, c, 0.04,
                                       ))
    assert abs(ref - fused) < 1e-4, (ref, fused)


def test_fused_matches_reference_grad():
    s, te, valid, c = _inputs(seed=1)
    g_ref = jax.grad(lambda s: dino_char_loss(s, te, valid, c, 0.04))(s)
    g_fused = jax.grad(lambda s: dino_char_loss_fused(s, te, valid, c, 0.04))(s)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=2e-6, rtol=1e-4)


def test_swap_halves_multi_block():
    """Half-rotated teacher addressing with >2 row blocks per half."""
    from ccd_tpu.ops.fused_dino_ce import fused_dino_row_ce
    rng = np.random.default_rng(3)
    r, k = 512, 256  # row_block=128 -> 4 blocks, half offset = 2
    s = jnp.asarray(rng.normal(size=(r, k)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(r, k)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(1, k)).astype(np.float32))
    ce = fused_dino_row_ce(s, t, c, 0.04, 0.1, row_block=128, k_block=128,
                           swap_halves=True)
    t_sw = jnp.concatenate([t[r // 2:], t[:r // 2]], axis=0)
    q = jax.nn.softmax((t_sw - c) / 0.04, axis=-1)
    ref = jnp.sum(-q * jax.nn.log_softmax(s / 0.1, axis=-1), axis=-1)
    np.testing.assert_allclose(np.asarray(ce), np.asarray(ref), atol=1e-4,
                               rtol=1e-5)
    # gradient pairs ds_i with the SWAPPED teacher row too
    g = jax.grad(lambda s: jnp.sum(fused_dino_row_ce(
        s, t, c, 0.04, 0.1, 128, 128, True)))(s)
    g_ref = jax.grad(lambda s: jnp.sum(
        -q * jax.nn.log_softmax(s / 0.1, axis=-1)))(s)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-6,
                               rtol=1e-4)


def test_fused_multi_chunk_grid():
    """K spanning multiple k_block chunks exercises the online rescaling."""
    from ccd_tpu.ops.fused_dino_ce import fused_dino_row_ce
    rng = np.random.default_rng(2)
    r, k = 8, 1024
    s = jnp.asarray(rng.normal(size=(r, k)).astype(np.float32) * 5)
    t = jnp.asarray(rng.normal(size=(r, k)).astype(np.float32) * 5)
    c = jnp.asarray(rng.normal(size=(1, k)).astype(np.float32))
    ce = fused_dino_row_ce(s, t, c, 0.04, 0.1, row_block=8, k_block=256)
    # plain-jnp reference
    sp = s / 0.1
    q = jax.nn.softmax((t - c) / 0.04, axis=-1)
    ref = jnp.sum(-q * jax.nn.log_softmax(sp, axis=-1), axis=-1)
    np.testing.assert_allclose(np.asarray(ce), np.asarray(ref), atol=1e-4,
                               rtol=1e-5)
