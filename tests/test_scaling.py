"""Multi-chip scaling evidence on the virtual 8-device CPU mesh (VERDICT r3 #5).

Wall-clock weak scaling cannot be asserted on this host (the 8 virtual
devices share ONE physical core, so even a perfect SPMD program's wall time
grows linearly with device count). What CAN be asserted deterministically is
what the weak-scaling measurement would diagnose: that GSPMD actually
partitions the work instead of replicating it.

* per-device FLOPs of the compiled 8-device step must be ~1/8 of the
  single-device step at the same global batch (a replicated DINO-head
  matmul or an accidental all-gather of the logits blows this up);
* per-device collective traffic must stay within a small multiple of the
  model's parameter bytes (data parallelism's floor is one gradient
  all-reduce; the reference's DDP inventory, Dino/modules/utils.py:478-510).

The v4-8 projection arithmetic lives in tools/collective_audit.py and the
README "projected multi-chip scaling" paragraph.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccd_tpu.losses import teacher_temp_schedule
from ccd_tpu.models import CCDPretrainModel
from ccd_tpu.parallel import (batch_sharding, pretrain_mesh,
                              pretrain_state_shardings)
from ccd_tpu.training import init_pretrain_state, make_fused_pretrain_step

GLOBAL_BATCH = 16


@pytest.fixture(scope="module")
def fused_setup():
    student = CCDPretrainModel(arch="vit_micro", out_dim=256,
                               with_seg_head=True, norm_last_layer=False)
    teacher = CCDPretrainModel(arch="vit_micro", out_dim=256,
                               with_seg_head=False)
    state, tx = init_pretrain_state(jax.random.PRNGKey(0), student, teacher)
    return state, student, teacher, tx


def _compile(state, student, teacher, tx, n_devices):
    mesh = pretrain_mesh(n_devices)
    step = make_fused_pretrain_step(
        student, teacher, tx, severity=1, base_lr=5e-4, min_lr=1e-6,
        total_iters=100, warmup_iters=10, weight_decay=0.04,
        weight_decay_end=0.4, momentum_teacher=0.996,
        teacher_temps=teacher_temp_schedule(0.04, 0.04, 0, 10),
        clip_grad=3.0, freeze_last_layer=0, global_batch=GLOBAL_BATCH,
        imgnet_based=1_000_000, mesh=mesh)
    st = jax.device_put(state, pretrain_state_shardings(state, mesh))
    bs = batch_sharding(mesh)
    raws = jax.device_put(jnp.zeros((GLOBAL_BATCH, 32, 128, 3), jnp.float32), bs)
    masks = jax.device_put(jnp.zeros((GLOBAL_BATCH, 32, 128), jnp.float32), bs)
    return jax.jit(step).lower(st, raws, masks).compile()


def test_weak_scaling_flops_partition(fused_setup):
    """Per-device FLOPs at 8 devices ~ 1/8 of single-device (same global
    batch): the compiled module is genuinely partitioned, not replicated."""
    state, student, teacher, tx = fused_setup
    flops = {}
    for n in (1, 8):
        compiled = _compile(state, student, teacher, tx, n)
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops[n] = float(cost["flops"])
    ratio = flops[1] / flops[8]
    # perfect partitioning -> 8.0; allow overhead for collectives, padding
    # and the replicated optimizer math on the (tiny) unsharded leaves
    assert ratio > 4.0, f"8-device step does too much per-device work: " \
        f"single {flops[1]:.3g} vs per-device {flops[8]:.3g} (ratio {ratio:.2f})"


def test_collective_traffic_bounded(fused_setup):
    """Per-device wire bytes of the 8-device step stay within a small
    multiple of the parameter bytes (the data-parallel gradient psum floor).
    Catches an accidental logit all-gather (batch-sized traffic) sneaking
    around the loss."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from collective_audit import audit_hlo

    state, student, teacher, tx = fused_setup
    compiled = _compile(state, student, teacher, tx, 8)
    rows = audit_hlo(compiled.as_text(), 8)
    assert rows, "no collectives found — expected at least the gradient psum"
    total_wire = sum(r["wire_bytes_per_device"] for r in rows)
    param_bytes = sum(np.asarray(p).nbytes
                      for p in jax.tree.leaves(state.student_params))
    # floor: one fp32 grad all-reduce = 2*(N-1)/N * params ~ 1.75x params.
    # allow 4x for the center/metric/BN psums and scheduling duplicates.
    assert total_wire < 4.0 * param_bytes, (
        f"collective traffic {total_wire / 1e6:.1f} MB/device vs params "
        f"{param_bytes / 1e6:.1f} MB — something batch-sized is being "
        f"gathered")
