"""Flash-attention kernel correctness (interpret mode on CPU) vs einsum ref."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import ccd_tpu.ops.flash_attention as fa


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas_call in interpreter mode (no TPU in the test env)."""
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


def _ref_attention(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(q.dtype), v)


def test_flash_forward_matches_einsum():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(4, 64, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(4, 64, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(4, 64, 32)).astype(np.float32))
    scale = 32 ** -0.5
    out = fa.flash_attention(q, k, v, scale)
    ref = _ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_backward_matches_einsum():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 32, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 32, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 32, 16)).astype(np.float32))
    scale = 16 ** -0.5
    co = jnp.asarray(rng.normal(size=(2, 32, 16)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, scale) * co)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attention(q, k, v, scale) * co)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5,
                                   err_msg=f"d{name}")


def test_mha_layout_roundtrip():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(2, 16, 3, 8)).astype(np.float32))  # B,S,H,D
    k = jnp.asarray(rng.normal(size=(2, 16, 3, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 16, 3, 8)).astype(np.float32))
    out = fa.mha(q, k, v, 8 ** -0.5)
    assert out.shape == (2, 16, 3, 8)
    # per-head equivalence with the reference math
    ref = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * 8 ** -0.5
    ref = jax.nn.softmax(ref, axis=-1).astype(q.dtype)
    ref = jnp.einsum("bhqk,bkhd->bqhd", ref, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_mha_packed_matches_einsum_value_and_grad():
    """The packed-qkv kernel (production ViT attention path) must match the
    per-head einsum reference for value AND the full qkv cotangent."""
    rng = np.random.default_rng(3)
    b, s, h, d = 2, 32, 3, 8
    qkv = jnp.asarray(rng.standard_normal((b, s, 3, h, d)), jnp.float32)
    scale = d ** -0.5

    def ref(qkv):
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        a = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
        p = jax.nn.softmax(a, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, s, h * d)

    out = fa.mha_packed(qkv.reshape(b, s, 3 * h * d), scale, h)
    assert out.shape == (b, s, h * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(qkv)),
                               atol=2e-5)

    co = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    gp = jax.grad(lambda x: jnp.sum(
        fa.mha_packed(x.reshape(b, s, 3 * h * d), scale, h) * co))(qkv)
    gr = jax.grad(lambda x: jnp.sum(ref(x) * co))(qkv)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=3e-5)


def test_mha_packed_bias_fuses_the_dense_bias():
    """mha_packed_bias(y, b) == mha_packed(y + b) for value and gradients,
    including the bias cotangent (row-sum of the qkv cotangent)."""
    rng = np.random.default_rng(4)
    b, s, h, d = 2, 32, 3, 8
    c3 = 3 * h * d
    y = jnp.asarray(rng.standard_normal((b, s, c3)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c3,)), jnp.float32)
    scale = d ** -0.5

    out = fa.mha_packed_bias(y, bias, scale, h)
    ref = fa.mha_packed(y + bias, scale, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    co = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    gy, gb = jax.grad(
        lambda yy, bb: jnp.sum(fa.mha_packed_bias(yy, bb, scale, h) * co),
        argnums=(0, 1))(y, bias)
    gy_ref, gb_ref = jax.grad(
        lambda yy, bb: jnp.sum(fa.mha_packed(yy + bb, scale, h) * co),
        argnums=(0, 1))(y, bias)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref), atol=1e-4)
