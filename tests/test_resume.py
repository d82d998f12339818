"""Pretrain resume correctness (VERDICT #8): kill/restart mid-virtual-epoch.

Runs the jitted pretrain step on the 8-device mesh, checkpoints mid-run with
the SAME payload glue the train CLI uses (``pretrain_state_payload`` +
``CheckpointManager``), restores into a freshly-initialized state (simulating
a new process), continues, and asserts the resumed trajectory is identical to
an uninterrupted one — iteration counter, DINO center, EMA teacher, optimizer
state and student params all continue exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccd_tpu.checkpoints.orbax_io import CheckpointManager
from ccd_tpu.losses import teacher_temp_schedule
from ccd_tpu.models import CCDPretrainModel
from ccd_tpu.parallel import data_mesh, replicated_sharding, shard_batch
from ccd_tpu.training import (init_pretrain_state, make_pretrain_step,
                              pretrain_state_payload)

from test_train_steps import _pretrain_batch


def _build(seed=0):
    # deterministic config: no dropout/drop-path so the (unsaved) rng key
    # cannot influence the trajectory — matching the CLI's production configs
    student = CCDPretrainModel(arch="vit_micro", out_dim=128,
                               with_seg_head=True, drop_path_rate=0.0)
    teacher = CCDPretrainModel(arch="vit_micro", out_dim=128,
                               with_seg_head=False)
    state, tx = init_pretrain_state(jax.random.PRNGKey(seed), student, teacher)
    step = make_pretrain_step(
        student, teacher, tx, base_lr=5e-4, min_lr=1e-6, total_iters=20,
        warmup_iters=2, weight_decay=0.04, weight_decay_end=0.4,
        momentum_teacher=0.996,
        teacher_temps=teacher_temp_schedule(0.04, 0.04, 0, 5),
        clip_grad=3.0, freeze_last_layer=1, global_batch=8, imgnet_based=1000)
    return state, step


def test_pretrain_resume_continuity(tmp_path):
    mesh = data_mesh(8)
    rep = replicated_sharding(mesh)
    rng = np.random.default_rng(7)
    batches = [
        shard_batch(tuple(jnp.asarray(a) for a in _pretrain_batch(rng, b=8)),
                    mesh)
        for _ in range(6)
    ]

    state, step = _build()
    state = jax.device_put(state, rep)
    jstep = jax.jit(step)

    # ---- uninterrupted run, checkpoint at iteration 3 (the CLI's payload)
    manager = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for it, batch in enumerate(batches):
        if it == 3:
            manager.save(it, jax.device_get(pretrain_state_payload(state)))
            manager.wait()
        state, _ = jstep(state, *batch)
    final_direct = jax.device_get(state)

    # ---- "new process": fresh init (different seed -> different params),
    # restore the payload exactly like train.py does, continue from it 3.
    # (The step function itself is reused — recompiling the identical HLO a
    # second time would only test the compile cache, not resume.)
    state2, _ = _build(seed=123)
    latest = manager.latest_step()
    assert latest == 3
    restored = manager.restore(latest,
                               jax.device_get(pretrain_state_payload(state2)))
    state2 = jax.device_put(state2.replace(**restored), rep)
    assert int(jax.device_get(state2.iteration)) == 3
    for batch in batches[3:]:
        state2, _ = jstep(state2, *batch)
    final_resumed = jax.device_get(state2)

    # ---- continuity: everything that is part of the payload tracks exactly
    assert int(final_resumed.iteration) == int(final_direct.iteration) == 6
    np.testing.assert_allclose(np.asarray(final_resumed.center),
                               np.asarray(final_direct.center), atol=1e-6)
    for name in ("student_params", "teacher_params", "opt_state"):
        a = jax.tree_util.tree_leaves_with_path(getattr(final_direct, name))
        b = jax.tree_util.tree_leaves_with_path(getattr(final_resumed, name))
        assert len(a) == len(b)
        for (pa, va), (pb, vb) in zip(a, b):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(va), np.asarray(vb), atol=1e-6,
                err_msg=f"{name}:{jax.tree_util.keystr(pa)}")
