"""Fused DINO distillation cross-entropy Pallas kernel.

The DINO loss (``Dino_loss.py:89-99``) computes, per character slot,
``-softmax((t - c)/tt) · log_softmax(s/st)`` over K=65536 prototype logits.
The XLA path materializes several (rows, 65536) fp32 intermediates in HBM
(teacher softmax, student log-softmax, their product) — ~15 ms/step at the
reference batch. This kernel computes the row CE in ONE pass over K with
online (flash-style) max/sum rescaling, reading each logit exactly once; the
custom VJP recomputes the two softmaxes chunk-wise and writes only the
student gradient (teacher is stop-gradient by construction).

Layout: rows = flattened (2B * T) char slots, K tiled in VMEM-sized chunks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _fwd_kernel(tt_ref, s_ref, t_ref, c_ref, ce_ref, stats_ref, *, st: float):
    """Grid: (row_blocks, k_chunks); K is the sequential minor dimension.

    stats scratch rows: m_s, l_s (student max / sumexp), m_t, l_t (teacher),
    acc (running sum of p_unnorm * s'), all rescaled online.
    """
    kc = pl.program_id(1)
    nk = pl.num_programs(1)

    tt = tt_ref[0]
    s = s_ref[...].astype(jnp.float32) / st                    # (R, Kb)
    t = (t_ref[...].astype(jnp.float32) - c_ref[...].astype(jnp.float32)) / tt

    @pl.when(kc == 0)
    def _():
        stats_ref[0, :] = jnp.full_like(stats_ref[0, :], _NEG)  # m_s
        stats_ref[1, :] = jnp.zeros_like(stats_ref[1, :])       # l_s
        stats_ref[2, :] = jnp.full_like(stats_ref[2, :], _NEG)  # m_t
        stats_ref[3, :] = jnp.zeros_like(stats_ref[3, :])       # l_t
        stats_ref[4, :] = jnp.zeros_like(stats_ref[4, :])       # acc = sum p*s'

    m_s = stats_ref[0, :]
    l_s = stats_ref[1, :]
    m_t = stats_ref[2, :]
    l_t = stats_ref[3, :]
    acc = stats_ref[4, :]

    cm_s = jnp.max(s, axis=1)
    new_m_s = jnp.maximum(m_s, cm_s)
    l_s = l_s * jnp.exp(m_s - new_m_s) + jnp.sum(jnp.exp(s - new_m_s[:, None]), axis=1)

    cm_t = jnp.max(t, axis=1)
    new_m_t = jnp.maximum(m_t, cm_t)
    scale_t = jnp.exp(m_t - new_m_t)
    p = jnp.exp(t - new_m_t[:, None])
    l_t = l_t * scale_t + jnp.sum(p, axis=1)
    acc = acc * scale_t + jnp.sum(p * s, axis=1)

    stats_ref[0, :] = new_m_s
    stats_ref[1, :] = l_s
    stats_ref[2, :] = new_m_t
    stats_ref[3, :] = l_t
    stats_ref[4, :] = acc

    @pl.when(kc == nk - 1)
    def _():
        lse = jnp.log(l_s) + new_m_s
        ce_ref[0, :] = -(acc / l_t - lse)


def _bwd_kernel(tt_ref, s_ref, t_ref, c_ref, g_ref, stats_ref, ds_ref, *,
                st: float):
    """ds = g * (softmax(s') - softmax(t')) / st, chunk-wise from saved stats."""
    tt = tt_ref[0]
    s = s_ref[...].astype(jnp.float32) / st
    t = (t_ref[...].astype(jnp.float32) - c_ref[...].astype(jnp.float32)) / tt
    p_s = jnp.exp(s - stats_ref[0, :][:, None]) / stats_ref[1, :][:, None]
    p_t = jnp.exp(t - stats_ref[2, :][:, None]) / stats_ref[3, :][:, None]
    ds_ref[...] = ((g_ref[0, :][:, None] / st) * (p_s - p_t)).astype(ds_ref.dtype)


def _check_blocks(r, k, row_block, k_block):
    row_block = min(row_block, r)
    k_block = min(k_block, k)
    # padding a block would inject fake logits into the softmax
    assert r % row_block == 0, (r, row_block)
    assert k % k_block == 0, (k, k_block)
    return row_block, k_block


def _run_fwd(s, t, c, tt, st, row_block, k_block):
    r, k = s.shape
    row_block, k_block = _check_blocks(r, k, row_block, k_block)
    grid = (pl.cdiv(r, row_block), pl.cdiv(k, k_block))
    tt_arr = jnp.asarray(tt, jnp.float32).reshape(1)
    tt_spec = pl.BlockSpec((1,), lambda i, j: (0,), memory_space=pltpu.SMEM)
    io_spec = pl.BlockSpec((row_block, k_block), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, k_block), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    ce, stats = pl.pallas_call(
        functools.partial(_fwd_kernel, st=st),
        grid=grid,
        in_specs=[tt_spec, io_spec, io_spec, c_spec],
        out_specs=(
            pl.BlockSpec((1, row_block), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, row_block), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, r), jnp.float32),
            jax.ShapeDtypeStruct((5, r), jnp.float32),
        ),
    )(tt_arr, s, t, c)
    return ce[0], stats


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_dino_row_ce(s: jnp.ndarray, t: jnp.ndarray, c: jnp.ndarray,
                      teacher_temp=0.04, student_temp: float = 0.1,
                      row_block: int = 256, k_block: int = 2048) -> jnp.ndarray:
    """Per-row CE: -softmax((t-c)/tt) · log_softmax(s/st).

    s, t: (R, K) logits (any float dtype); c: (1, K) center; teacher_temp may
    be a traced scalar (read from SMEM). Returns (R,) f32. Teacher, center and
    temperature are non-differentiated, matching the reference's detached
    teacher (Dino_loss.py:90).
    """
    ce, _ = _run_fwd(s, t, c, teacher_temp, student_temp, row_block, k_block)
    return ce


def _fwd_rule(s, t, c, teacher_temp, student_temp, row_block, k_block):
    ce, stats = _run_fwd(s, t, c, teacher_temp, student_temp, row_block, k_block)
    return ce, (s, t, c, teacher_temp, stats)


def _bwd_rule(student_temp, row_block, k_block, res, g):
    s, t, c, teacher_temp, stats = res
    tt_arr = jnp.asarray(teacher_temp, jnp.float32).reshape(1)
    tt_spec = pl.BlockSpec((1,), lambda i, j: (0,), memory_space=pltpu.SMEM)
    r, k = s.shape
    row_block, k_block = _check_blocks(r, k, row_block, k_block)
    grid = (pl.cdiv(r, row_block), pl.cdiv(k, k_block))
    io_spec = pl.BlockSpec((row_block, k_block), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, k_block), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, row_block), lambda i, j: (0, i),
                          memory_space=pltpu.VMEM)
    stats_spec = pl.BlockSpec((5, row_block), lambda i, j: (0, i),
                              memory_space=pltpu.VMEM)
    ds = pl.pallas_call(
        functools.partial(_bwd_kernel, st=student_temp),
        grid=grid,
        in_specs=[tt_spec, io_spec, io_spec, c_spec, g_spec, stats_spec],
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct(s.shape, s.dtype),
    )(tt_arr, s, t, c, g.reshape(1, -1), stats)
    return ds, None, None, None


fused_dino_row_ce.defvjp(_fwd_rule, _bwd_rule)
