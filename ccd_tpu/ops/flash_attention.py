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
# The `mha` wrapper physically transposes q/k/v/out between the (B, S, C)
# layout the qkv Dense produces and the (B*H, S, D) layout the folded kernel
# wants — ~15 ms/step of pure layout traffic in the ViT-Small pretrain
# profile (transposes move at ~171 GB/s vs the chip's ~463 GB/s copy rate).
# The packed variant feeds the RAW Dense output (B, S, 3C) to a kernel
# gridded over B with fully contiguous 2-D blocks and slices per-head q/k/v
# on the LANE axis inside VMEM. Lane slices keep S on sublanes — no vector
# relayout at all (an earlier 5-D formulation that sliced heads through a
# (1,S,3,H,D) block paid a ~1.8x in-kernel relayout tax: 71.2 vs 39.5 ms on
# the 12-block fwd+bwd microbench; Mosaic rejects strided per-head STORES
# entirely, so outputs are lane-concatenated into one full-block store).
# The output is the (B, S, C) array the proj Dense consumes, and the
# backward emits the (B, S, 3C) cotangent of the Dense output directly —
# no layout change anywhere in either direction.
#
# Channel order within 3C matches torch's qkv packing: [q h0..hH | k h0..hH
# | v h0..hH], each head D wide (``vision_transformer.py:160-167``).


def _packed_fwd_kernel(qkv_ref, bias_ref, o_ref, *, scale: float,
                       heads: int, d: int):
    # bias is added HERE (one VPU add over the VMEM block): the qkv Dense
    # cannot fuse its bias into an opaque pallas consumer, so doing it on
    # the host graph cost a full (B,S,3C) HBM round-trip (~4 ms/step).
    blk = qkv_ref[0] + bias_ref[0]  # (S, 3C)
    c = heads * d
    outs = []
    for h in range(heads):
        q = blk[:, 0 * c + h * d:0 * c + (h + 1) * d]  # (S, D) lane slice
        k = blk[:, 1 * c + h * d:1 * c + (h + 1) * d]
        v = blk[:, 2 * c + h * d:2 * c + (h + 1) * d]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jnp.dot(p.astype(q.dtype), v,
                            preferred_element_type=jnp.float32))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _packed_bwd_kernel(qkv_ref, bias_ref, do_ref, dqkv_ref, *, scale: float,
                       heads: int, d: int):
    blk = qkv_ref[0] + bias_ref[0]
    c = heads * d
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        q = blk[:, 0 * c + h * d:0 * c + (h + 1) * d]
        k = blk[:, 1 * c + h * d:1 * c + (h + 1) * d]
        v = blk[:, 2 * c + h * d:2 * c + (h + 1) * d]
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
    dqkv_ref[0] = jnp.concatenate(
        dqs + dks + dvs, axis=-1).astype(dqkv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def mha_packed_bias(qkv: jnp.ndarray, bias: jnp.ndarray, scale: float,
                    heads: int) -> jnp.ndarray:
    """Fused attention on the raw UNBIASED qkv projection (B, S, 3C) plus
    its bias (3C,) -> (B, S, C). The bias add happens inside the kernel."""
    return _packed_forward(qkv, bias, scale, heads)


def mha_packed(qkv: jnp.ndarray, scale: float, heads: int) -> jnp.ndarray:
    """Fused attention on the raw (already-biased) qkv Dense output
    (B, S, 3C) -> (B, S, C)."""
    return mha_packed_bias(qkv, jnp.zeros((qkv.shape[-1],), qkv.dtype),
                           scale, heads)


def _packed_forward(qkv, bias, scale, heads):
    b, s, c3 = qkv.shape
    c = c3 // 3
    in_spec = pl.BlockSpec((1, s, c3), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, c3), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_packed_fwd_kernel, scale=scale, heads=heads,
                          d=c // heads),
        grid=(b,),
        in_specs=[in_spec, bias_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, c), qkv.dtype),
    )(qkv, bias.reshape(1, c3).astype(qkv.dtype))


def _packed_fwd_rule(qkv, bias, scale, heads):
    return _packed_forward(qkv, bias, scale, heads), (qkv, bias)


def _packed_bwd_rule(scale, heads, res, do):
    qkv, bias = res
    b, s, c3 = qkv.shape
    c = c3 // 3
    in_spec = pl.BlockSpec((1, s, c3), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, c3), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    do_spec = pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    dqkv = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, scale=scale, heads=heads,
                          d=c // heads),
        grid=(b,),
        in_specs=[in_spec, bias_spec, do_spec],
        out_specs=in_spec,
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
    )(qkv, bias.reshape(1, c3).astype(qkv.dtype), do)
    # d(bias) is the row-sum of the qkv cotangent (additive bias); when the
    # caller discards it (mha_packed's zero bias) XLA dead-code-eliminates
    # the reduction.
    dbias = jnp.sum(dqkv.astype(jnp.float32),
                    axis=(0, 1)).astype(bias.dtype)
    return (dqkv, dbias)


mha_packed_bias.defvjp(_packed_fwd_rule, _packed_bwd_rule)
