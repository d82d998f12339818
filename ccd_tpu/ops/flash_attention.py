"""Fused multi-head attention Pallas kernel for short sequences.

The CCD ViT runs attention over a fixed 256-token grid (32x128 / patch 4 —
``vision_transformer.py:238``): tiny by flash-attention standards, so the
whole (S, D) Q/K/V of one (batch, head) fits VMEM and the kernel needs no
KV tiling at all. The win over the XLA einsum+softmax path is purely HBM
traffic: the (B, H, S, S) attention matrix is never materialized — forward
computes QK^T -> softmax -> PV entirely in VMEM, and the custom VJP
recomputes P in the backward kernel (classic flash recompute) instead of
saving it.

Numerics: logits and softmax in fp32 (matching the fp32-softmax einsum path),
output in the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (S, D)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p.astype(q.dtype), v,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (S, S) fp32

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # softmax bwd
    ds = (ds * scale).astype(q.dtype)
    dq_ref[0] = jnp.dot(ds, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).astype(dk_ref.dtype)
    dv_ref[0] = jax.lax.dot_general(p.astype(q.dtype), do,
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).astype(dv_ref.dtype)


def _specs(bh, s, d):
    spec = pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float) -> jnp.ndarray:
    """Fused attention: q/k/v (BH, S, D) -> (BH, S, D); softmax(q k^T scale) v."""
    return _forward(q, k, v, scale)


def _forward(q, k, v, scale):
    bh, s, d = q.shape
    spec = _specs(bh, s, d)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(bh,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v)


def _fwd_rule(q, k, v, scale):
    return _forward(q, k, v, scale), (q, k, v)


def _bwd_rule(scale, res, do):
    q, k, v = res
    bh, s, d = q.shape
    spec = _specs(bh, s, d)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(bh,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
    )(q, k, v, do)
    return dq, dk, dv


flash_attention.defvjp(_fwd_rule, _bwd_rule)


def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float
        ) -> jnp.ndarray:
    """(B, S, H, D) attention via the fused kernel; returns (B, S, H, D)."""
    b, s, h, d = q.shape
    fold = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
    out = flash_attention(fold(q), fold(k), fold(v), scale)
    return jnp.transpose(out.reshape(b, h, s, d), (0, 2, 1, 3))


# --------------------------------------------------------------- packed layout
#
# The `mha` wrapper physically transposes q/k/v/out between the (B, S, H, D)
# layout the qkv Dense produces and the (B*H, S, D) layout the kernel wants —
# ~15 ms/step of pure layout traffic in the 160 ms ViT-Small pretrain profile
# (transposes run at ~171 GB/s vs the chip's ~463 GB/s copy rate). The packed
# variant instead feeds the Dense output (B, S, 3, H, D) — a FREE reshape —
# to a kernel gridded over B alone with fully CONTIGUOUS blocks. Per-head
# q/k/v are static VMEM slices; per-head outputs are lane-concatenated into
# one (S, H*D) store (Mosaic cannot store through a strided head slice, but a
# full-block store of the concat is a plain 2-D write). The output is the
# (B, S, C) array the proj Dense consumes — no layout change in either
# direction, and the backward returns dq/dk/dv as three such arrays that XLA
# stacks straight into the qkv Dense's cotangent.


def _packed_fwd_kernel(qkv_ref, o_ref, *, scale: float, heads: int):
    outs = []
    for h in range(heads):
        q = qkv_ref[0, :, 0, h, :]  # (S, D) static slice
        k = qkv_ref[0, :, 1, h, :]
        v = qkv_ref[0, :, 2, h, :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jnp.dot(p.astype(q.dtype), v,
                            preferred_element_type=jnp.float32))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _packed_bwd_kernel(qkv_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                       scale: float, heads: int):
    d = qkv_ref.shape[-1]
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        q = qkv_ref[0, :, 0, h, :]
        k = qkv_ref[0, :, 1, h, :]
        v = qkv_ref[0, :, 2, h, :]
        do = do_ref[0, :, h * d:(h + 1) * d]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * scale).astype(q.dtype)
        dqs.append(jnp.dot(ds, k, preferred_element_type=jnp.float32))
        dks.append(jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
        dvs.append(jax.lax.dot_general(p.astype(q.dtype), do,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
    dq_ref[0] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)
    dk_ref[0] = jnp.concatenate(dks, axis=-1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1).astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def mha_packed(qkv: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Fused attention on packed qkv (B, S, 3, H, D) -> (B, S, H*D)."""
    return _packed_forward(qkv, scale)


def _packed_forward(qkv, scale):
    b, s, three, h, d = qkv.shape
    in_spec = pl.BlockSpec((1, s, 3, h, d), lambda i: (i, 0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, s, h * d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_packed_fwd_kernel, scale=scale, heads=h),
        grid=(b,),
        in_specs=[in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, h * d), qkv.dtype),
    )(qkv)


def _packed_fwd_rule(qkv, scale):
    return _packed_forward(qkv, scale), (qkv,)


def _packed_bwd_rule(scale, res, do):
    (qkv,) = res
    b, s, three, h, d = qkv.shape
    in_spec = pl.BlockSpec((1, s, 3, h, d), lambda i: (i, 0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((1, s, h * d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    flat = jax.ShapeDtypeStruct((b, s, h * d), qkv.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, scale=scale, heads=h),
        grid=(b,),
        in_specs=[in_spec, flat_spec],
        out_specs=(flat_spec, flat_spec, flat_spec),
        out_shape=(flat, flat, flat),
    )(qkv, do)
    # (B, S, 3, H, D) cotangent for the free reshape of the Dense output;
    # XLA fuses the stack into the qkv projection's backward dot.
    dqkv = jnp.stack([dq, dk, dv], axis=2).reshape(b, s, 3, h, d)
    return (dqkv,)


mha_packed.defvjp(_packed_fwd_rule, _packed_bwd_rule)
