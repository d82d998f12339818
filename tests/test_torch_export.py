"""Flax -> torch export roundtrips (inverse of torch_import).

Cross-stack loading into the reference's own modules is covered in
``test_reference_parity.py::test_export_recognizer_decodes_on_reference``;
here: export ∘ import == identity on every parameter array, so a
ccd-tpu-trained checkpoint survives the trip into the reference layout and
back bit-for-bit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccd_tpu.checkpoints.torch_export import (
    export_pretrain_state_dicts, export_recognizer_state_dict,
)
from ccd_tpu.checkpoints.torch_import import (
    convert_pretrain_checkpoint, convert_recognizer_checkpoint,
)
from ccd_tpu.models import CCDPretrainModel, CCDRecognizer


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (pa, va), (_, vb) in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(va, np.float32),
                                      np.asarray(vb, np.float32),
                                      err_msg=jax.tree_util.keystr(pa))


def test_recognizer_export_import_roundtrip():
    model = CCDRecognizer(arch="vit_micro", max_seq_len=8,
                          decoder_n_layers=2, decoder_d_embedding=64,
                          decoder_n_head=4, decoder_d_k=16, decoder_d_v=16,
                          decoder_d_model=64, decoder_d_inner=128)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 32, 128, 3))
    tgt = jnp.full((1, 8), model.padding_idx, jnp.int32).at[:, 0].set(
        model.start_idx)
    params = model.init({"params": rng, "dropout": rng}, img, tgt,
                        train_mode=True)["params"]

    sd = export_recognizer_state_dict(jax.device_get(params))
    back = convert_recognizer_checkpoint(sd, n_layers=2,
                                         depth=3)  # vit_micro depth
    _assert_trees_equal(params, back)


def test_recognizer_export_module_prefix():
    model = CCDRecognizer(arch="vit_micro", max_seq_len=6,
                          decoder_n_layers=1, decoder_d_embedding=32,
                          decoder_n_head=2, decoder_d_k=16, decoder_d_v=16,
                          decoder_d_model=32, decoder_d_inner=64)
    rng = jax.random.PRNGKey(1)
    img = jnp.zeros((1, 32, 128, 3))
    tgt = jnp.full((1, 6), model.padding_idx, jnp.int32).at[:, 0].set(
        model.start_idx)
    params = model.init({"params": rng, "dropout": rng}, img, tgt,
                        train_mode=True)["params"]
    sd = export_recognizer_state_dict(jax.device_get(params),
                                      module_prefix=True)
    assert all(k.startswith("module.") for k in sd)
    # the importer strips DataParallel prefixes (torch_import._strip_module)
    back = convert_recognizer_checkpoint(sd, n_layers=1, depth=3)
    _assert_trees_equal(params, back)


def test_pretrain_export_import_roundtrip():
    student = CCDPretrainModel(arch="vit_micro", out_dim=64,
                               with_seg_head=True, norm_last_layer=False)
    teacher = CCDPretrainModel(arch="vit_micro", out_dim=64,
                               with_seg_head=False)
    from ccd_tpu.training import init_pretrain_state
    state, _ = init_pretrain_state(jax.random.PRNGKey(2), student, teacher)

    sds = export_pretrain_state_dicts(
        jax.device_get(state.student_params),
        jax.device_get(state.teacher_params),
        jax.device_get(state.student_stats))
    s_params, s_stats = convert_pretrain_checkpoint(
        {"student": sds["student"], "teacher": sds["teacher"]},
        branch="student", depth=3)
    t_params, _ = convert_pretrain_checkpoint(
        {"student": sds["student"], "teacher": sds["teacher"]},
        branch="teacher", depth=3)
    _assert_trees_equal(state.student_params, s_params)
    _assert_trees_equal(state.student_stats, s_stats)
    _assert_trees_equal(state.teacher_params, t_params)


def test_save_recognizer_torch_pickle(tmp_path):
    torch = pytest.importorskip("torch")
    model = CCDRecognizer(arch="vit_micro", max_seq_len=6,
                          decoder_n_layers=1, decoder_d_embedding=32,
                          decoder_n_head=2, decoder_d_k=16, decoder_d_v=16,
                          decoder_d_model=32, decoder_d_inner=64)
    rng = jax.random.PRNGKey(3)
    img = jnp.zeros((1, 32, 128, 3))
    tgt = jnp.full((1, 6), model.padding_idx, jnp.int32).at[:, 0].set(
        model.start_idx)
    params = model.init({"params": rng, "dropout": rng}, img, tgt,
                        train_mode=True)["params"]
    from ccd_tpu.checkpoints.torch_export import save_recognizer_torch
    path = str(tmp_path / "best_accuracy.pth")
    save_recognizer_torch(jax.device_get(params), path, iteration=7)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["iteration"] == 7
    back = convert_recognizer_checkpoint(ckpt, n_layers=1, depth=3)
    _assert_trees_equal(params, back)
