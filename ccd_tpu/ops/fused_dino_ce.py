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


def _interpret() -> bool:
    """Pallas interpret mode off-TPU: CPU meshes (the 8-device test/dryrun
    environment) run the SAME kernel through the interpreter, so the sharded
    fused-CE path is exercised without TPU hardware."""
    return jax.default_backend() != "tpu"


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


def _pick_block(n: int, cap: int, quantum: int = 128) -> int:
    """Largest divisor of ``n`` that is <= cap and a multiple of ``quantum``
    (the TPU lane width — row blocks land on the LANE axis of the ce/stats
    outputs). Falls back to ``n`` itself: a block equal to the full dimension
    is always a legal Pallas block shape. Padding a block is never an option
    here — fake logits would enter the softmax."""
    best = None
    d = quantum
    while d <= min(cap, n):
        if n % d == 0:
            best = d
        d += quantum
    return best if best is not None else n


def _check_blocks(r, k, row_block, k_block, swap_halves):
    if swap_halves:
        # the half-rotation of teacher row blocks needs the view boundary
        # (r // 2) block-aligned; picking a divisor of the HALF also makes
        # the block count even automatically
        assert r % 2 == 0, r
        return _pick_block(r // 2, row_block), _pick_block(k, k_block)
    return _pick_block(r, row_block), _pick_block(k, k_block)


def _t_index_map(swap_halves, n_row_blocks):
    """Teacher block index map. With ``swap_halves`` the teacher's view
    halves are rotated against the student's (row block i reads teacher
    block (i + n/2) mod n) — the DINO cross-view pairing (teacher view 1
    distills into student view 2 and vice versa) done by ADDRESSING instead
    of materializing sliced/re-concatenated logit copies at the kernel
    boundary (which costs ~16 ms/step in HBM traffic at the reference
    shapes)."""
    if not swap_halves:
        return lambda i, j: (i, j)
    half = n_row_blocks // 2
    return lambda i, j: ((i + half) % n_row_blocks, j)


def _run_fwd(s, t, c, tt, st, row_block, k_block, swap_halves):
    r, k = s.shape
    row_block, k_block = _check_blocks(r, k, row_block, k_block, swap_halves)
    grid = (pl.cdiv(r, row_block), pl.cdiv(k, k_block))
    tt_arr = jnp.asarray(tt, jnp.float32).reshape(1)
    tt_spec = pl.BlockSpec((1,), lambda i, j: (0,), memory_space=pltpu.SMEM)
    io_spec = pl.BlockSpec((row_block, k_block), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((row_block, k_block),
                          _t_index_map(swap_halves, grid[0]),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, k_block), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    ce, stats = pl.pallas_call(
        functools.partial(_fwd_kernel, st=st),
        interpret=_interpret(),
        grid=grid,
        in_specs=[tt_spec, io_spec, t_spec, c_spec],
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_dino_row_ce(s: jnp.ndarray, t: jnp.ndarray, c: jnp.ndarray,
                      teacher_temp=0.04, student_temp: float = 0.1,
                      row_block: int = 256, k_block: int = 2048,
                      swap_halves: bool = False) -> jnp.ndarray:
    """Per-row CE: -softmax((t-c)/tt) · log_softmax(s/st).

    s, t: (R, K) logits (any float dtype); c: (1, K) center; teacher_temp may
    be a traced scalar (read from SMEM). Returns (R,) f32. Teacher, center and
    temperature are non-differentiated, matching the reference's detached
    teacher (Dino_loss.py:90).

    ``swap_halves``: pair student row i with teacher row (i + R/2) mod R —
    the DINO cross-view pairing over view-stacked logits, done inside the
    kernel's block addressing so callers never slice/permute the (R, K)
    arrays in HBM.
    """
    ce, _ = _run_fwd(s, t, c, teacher_temp, student_temp, row_block, k_block,
                     swap_halves)
    return ce


def _fwd_rule(s, t, c, teacher_temp, student_temp, row_block, k_block,
              swap_halves):
    ce, stats = _run_fwd(s, t, c, teacher_temp, student_temp, row_block,
                         k_block, swap_halves)
    return ce, (s, t, c, teacher_temp, stats)


def _bwd_rule(student_temp, row_block, k_block, swap_halves, res, g):
    s, t, c, teacher_temp, stats = res
    tt_arr = jnp.asarray(teacher_temp, jnp.float32).reshape(1)
    tt_spec = pl.BlockSpec((1,), lambda i, j: (0,), memory_space=pltpu.SMEM)
    r, k = s.shape
    row_block, k_block = _check_blocks(r, k, row_block, k_block, swap_halves)
    grid = (pl.cdiv(r, row_block), pl.cdiv(k, k_block))
    io_spec = pl.BlockSpec((row_block, k_block), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    # stats rows are indexed by STUDENT row (saved that way in the forward),
    # so only the raw teacher logits need the swapped addressing here
    t_spec = pl.BlockSpec((row_block, k_block),
                          _t_index_map(swap_halves, grid[0]),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, k_block), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, row_block), lambda i, j: (0, i),
                          memory_space=pltpu.VMEM)
    stats_spec = pl.BlockSpec((5, row_block), lambda i, j: (0, i),
                              memory_space=pltpu.VMEM)
    ds = pl.pallas_call(
        functools.partial(_bwd_kernel, st=student_temp),
        interpret=_interpret(),
        grid=grid,
        in_specs=[tt_spec, io_spec, t_spec, c_spec, g_spec, stats_spec],
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct(s.shape, s.dtype),
    )(tt_arr, s, t, c, g.reshape(1, -1), stats)
    return ds, None, None, None


fused_dino_row_ce.defvjp(_fwd_rule, _bwd_rule)
