"""Pretrain -> finetune checkpoint handoff (the 'teacher' -> backbone copy,
train_finetune.py:191-200) through both checkpoint formats."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccd_tpu.builders import load_pretrained_backbone
from ccd_tpu.checkpoints.orbax_io import CheckpointManager, restore_pytree, save_pytree
from ccd_tpu.models import CCDPretrainModel, CCDRecognizer
from ccd_tpu.training import init_finetune_state, init_pretrain_state


def test_orbax_handoff(tmp_path):
    student = CCDPretrainModel(arch="vit_micro", out_dim=64, with_seg_head=True,
                               norm_last_layer=False)
    teacher = CCDPretrainModel(arch="vit_micro", out_dim=64, with_seg_head=False)
    pstate, _ = init_pretrain_state(jax.random.PRNGKey(0), student, teacher)

    # save the pretrain payload the train.py CLI writes
    payload = {"student_params": pstate.student_params,
               "student_stats": pstate.student_stats,
               "teacher_params": pstate.teacher_params,
               "center": pstate.center,
               "iteration": pstate.iteration}
    ckpt = str(tmp_path / "pretrain_ckpt")
    save_pytree(ckpt, jax.device_get(payload))

    model = CCDRecognizer(arch="vit_micro", max_seq_len=6)
    fstate, _ = init_finetune_state(jax.random.PRNGKey(1), model)
    new_params = load_pretrained_backbone(ckpt, fstate.params)

    # backbone now equals the pretrained teacher's backbone
    src = jax.device_get(pstate.teacher_params["backbone"])
    dst = jax.device_get(new_params["backbone"])
    jax.tree.map(np.testing.assert_array_equal, src, dst)
    # decoder untouched
    jax.tree.map(np.testing.assert_array_equal,
                 jax.device_get(fstate.params["decoder"]),
                 jax.device_get(new_params["decoder"]))

    # and the recognizer still runs with the grafted backbone
    img = jnp.zeros((2, 32, 128, 3))
    probs = model.apply({"params": new_params}, img, train_mode=False)
    assert probs.shape == (2, 6, 92)


def test_checkpoint_manager_handoff(tmp_path):
    """load_pretrained_backbone must also accept a CheckpointManager dir
    (what the pretrain CLI actually produces)."""
    student = CCDPretrainModel(arch="vit_micro", out_dim=64, with_seg_head=True)
    teacher = CCDPretrainModel(arch="vit_micro", out_dim=64, with_seg_head=False)
    pstate, _ = init_pretrain_state(jax.random.PRNGKey(2), student, teacher)
    mgr_dir = str(tmp_path / "mgr")
    mgr = CheckpointManager(mgr_dir)
    mgr.save(3, jax.device_get({"teacher_params": pstate.teacher_params,
                                "center": pstate.center}))
    mgr.wait()

    model = CCDRecognizer(arch="vit_micro", max_seq_len=6)
    fstate, _ = init_finetune_state(jax.random.PRNGKey(3), model)
    new_params = load_pretrained_backbone(mgr_dir, fstate.params)
    src = jax.device_get(pstate.teacher_params["backbone"])
    jax.tree.map(np.testing.assert_array_equal, src,
                 jax.device_get(new_params["backbone"]))
