"""Activation parity against the REFERENCE'S OWN torch modules (VERDICT #1).

Round 1 verified conversion parity against hand-built torch twins; a
mis-transcribed twin could agree with a mis-transcribed flax module. These
tests import the actual modules from /root/reference (read-only):
``vits.vit_small`` (vision_transformer.py:280-285), ``DINOHead`` (:294-328),
``SegHead`` (segmentor.py:73-95), ``NRTRDecoder`` (nrtr_decoder.py:13-203),
``ABIDINOModel`` (dino_vision.py:21-115) and ``DINO_Finetune``
(dino_vision.py:135-290), convert their ``state_dict()`` with
``ccd_tpu.checkpoints.torch_import``, and assert activation parity at fp32
tolerances — including token-for-token greedy-decode equality. Drift in
EITHER the converter or any flax module against the real reference fails CI.

The reference import chain needs two dependency stubs (not installed here):
``fastai.vision`` (only ``ifnone`` is referenced by live code) and
``skimage.measure.label`` (backed by ``scipy.ndimage.label`` with
8-connectivity, the skimage 2-D default).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"


def _install_reference_stubs():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "fastai" not in sys.modules:
        fastai = types.ModuleType("fastai")
        vision = types.ModuleType("fastai.vision")
        vision.ifnone = lambda a, b: b if a is None else a
        vision.__all__ = ["ifnone"]
        fastai.vision = vision
        sys.modules["fastai"] = fastai
        sys.modules["fastai.vision"] = vision
    if "torchvision" not in sys.modules:
        # dino_vision.py imports torchvision.models only for its (dead) CNN
        # fallback branch; a bare module satisfies `arch in models.__dict__`
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
    if "mkl" not in sys.modules:
        # Dino/utils/kmeans.py does a bare `import mkl` (never calls it)
        sys.modules["mkl"] = types.ModuleType("mkl")
    if "skimage" not in sys.modules:
        from scipy import ndimage as ndi
        skimage = types.ModuleType("skimage")
        measure = types.ModuleType("skimage.measure")

        def _label(mask):
            out, _ = ndi.label(np.asarray(mask) > 0,
                               structure=np.ones((3, 3), dtype=int))
            return out

        measure.label = _label
        skimage.measure = measure
        sys.modules["skimage"] = skimage
        sys.modules["skimage.measure"] = measure


_install_reference_stubs()

from Dino.modules import vision_transformer as ref_vits  # noqa: E402
from Dino.modules.segmentor import SegHead as RefSegHead  # noqa: E402
from Dino.decoder.nrtr_decoder import NRTRDecoder as RefNRTRDecoder  # noqa: E402
from Dino.model.dino_vision import (ABIDINOModel as RefABIDINOModel,  # noqa: E402
                                    DINO_Finetune as RefDINOFinetune)

from ccd_tpu.checkpoints.torch_import import (  # noqa: E402
    convert_dino_head, convert_nrtr, convert_pretrain_checkpoint,
    convert_recognizer_checkpoint, convert_seg_head, convert_vit,
)
from ccd_tpu.models import (  # noqa: E402
    CCDPretrainModel, CCDRecognizer, DINOHead, NRTRDecoder, SegHead, vit_small,
)
from ccd_tpu.models.pretrain import char_validity_mask  # noqa: E402
from ccd_tpu.ops.pooling import char_attention_pool  # noqa: E402


# ------------------------------------------------------------------ ViT

def test_vit_small_forward_parity():
    """Full vit_small(patch_size=4) forward: tokens + all 3 seg taps."""
    torch.manual_seed(0)
    ref = ref_vits.vit_small(patch_size=4).eval()
    params = convert_vit(ref.state_dict(), prefix="", depth=12)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 32, 128)).astype(np.float32)
    with torch.no_grad():
        t_tokens, t_taps = ref(torch.from_numpy(x))

    ours = vit_small(patch_size=4)
    j_tokens, j_taps = ours.apply({"params": params},
                                  jnp.asarray(x.transpose(0, 2, 3, 1)),
                                  deterministic=True)
    np.testing.assert_allclose(np.asarray(j_tokens), t_tokens.numpy(),
                               atol=3e-4, rtol=1e-4)
    assert len(j_taps) == len(t_taps) == 3
    for jt, tt in zip(j_taps, t_taps):
        # ref taps are (N, E, 8, 32); ours (N, 8, 32, E)
        np.testing.assert_allclose(np.asarray(jt).transpose(0, 3, 1, 2),
                                   tt.numpy(), atol=3e-4, rtol=1e-4)


# ------------------------------------------------------------------ DINOHead

def test_dino_head_parity():
    torch.manual_seed(1)
    ref = ref_vits.DINOHead(384, 4096, use_bn=False, norm_last_layer=True).eval()
    params = convert_dino_head(ref.state_dict(), prefix="")

    rng = np.random.default_rng(1)
    x = rng.normal(size=(10, 384)).astype(np.float32)
    with torch.no_grad():
        t_out = ref(torch.from_numpy(x)).numpy()
    j_out = DINOHead(out_dim=4096).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5, rtol=1e-5)


# ------------------------------------------------------------------ SegHead

def test_seg_head_parity():
    torch.manual_seed(2)
    ref = RefSegHead(in_channels=384).eval()  # eval: BN uses running stats
    params, stats = convert_seg_head(ref.state_dict(), prefix="")

    rng = np.random.default_rng(2)
    taps = [rng.normal(size=(2, 384, 8, 32)).astype(np.float32) for _ in range(3)]
    with torch.no_grad():
        t_out = ref([torch.from_numpy(t) for t in taps]).numpy()
    j_out = SegHead().apply(
        {"params": params, "batch_stats": stats},
        [jnp.asarray(t.transpose(0, 2, 3, 1)) for t in taps], train=False)
    np.testing.assert_allclose(np.asarray(j_out).transpose(0, 3, 1, 2), t_out,
                               atol=1e-4, rtol=1e-4)


# ------------------------------------------------------------------ NRTR

_DEC_KW = dict(n_layers=3, d_embedding=64, n_head=4, d_k=16, d_v=16,
               d_model=64, d_inner=32, num_classes=93, max_seq_len=8,
               start_idx=91, padding_idx=92)


def _make_nrtr_pair(seed):
    torch.manual_seed(seed)
    ref = RefNRTRDecoder(n_position=200, dropout=0.1, **_DEC_KW).eval()
    params = convert_nrtr(ref.state_dict(), prefix="", n_layers=3)
    ours = NRTRDecoder(n_position=200, dropout=0.1, **_DEC_KW)
    return ref, ours, params


def test_nrtr_teacher_forced_parity():
    ref, ours, params = _make_nrtr_pair(3)
    rng = np.random.default_rng(3)
    enc = rng.normal(size=(3, 12, 64)).astype(np.float32)
    tgt = rng.integers(0, 93, size=(3, 8)).astype(np.int64)
    tgt[:, -2:] = 92  # some PAD tail
    with torch.no_grad():
        t_logits, t_attn = ref(None, torch.from_numpy(enc),
                               {"padded_targets": torch.from_numpy(tgt)},
                               None, train_mode=True)
    j_logits, j_attn = ours.apply({"params": params}, jnp.asarray(enc),
                                  jnp.asarray(tgt.astype(np.int32)),
                                  train_mode=True, deterministic=True)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_attn), t_attn.numpy(),
                               atol=1e-5, rtol=1e-4)


def test_nrtr_greedy_decode_token_parity():
    """KV-cached scan decode vs the reference's 25x full re-run loop
    (nrtr_decoder.py:151-175): per-step softmax close, argmax identical."""
    ref, ours, params = _make_nrtr_pair(4)
    rng = np.random.default_rng(4)
    enc = rng.normal(size=(4, 12, 64)).astype(np.float32)
    with torch.no_grad():
        t_probs = ref(None, torch.from_numpy(enc), None, None,
                      train_mode=False).numpy()
    j_probs = ours.apply({"params": params}, jnp.asarray(enc), None,
                         train_mode=False)
    np.testing.assert_allclose(np.asarray(j_probs), t_probs, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(j_probs).argmax(-1),
                                  t_probs.argmax(-1))


def test_nrtr_early_stop_parity_b1():
    """forward_test_speed parity for batch 1, where the reference's
    batch-global argmax==91 break rule coincides with per-sample EOS."""
    ref, ours, params = _make_nrtr_pair(5)
    rng = np.random.default_rng(5)
    enc = rng.normal(size=(1, 12, 64)).astype(np.float32)
    with torch.no_grad():
        t_probs = ref(None, torch.from_numpy(enc), None, None,
                      train_mode=False, test_speed=True).numpy()
    j_probs = np.asarray(ours.apply({"params": params}, jnp.asarray(enc),
                                    method="decode_greedy_early_stop"))
    t_steps = t_probs.shape[1]
    np.testing.assert_allclose(j_probs[:, :t_steps], t_probs, atol=1e-5)
    # ours zero-fills steps after every sequence is done
    assert np.all(j_probs[:, t_steps:] == 0)


# ------------------------------------------------------------------ ABIDINO

def test_abidino_attention_pool_parity():
    """ABIDINOModel.attention (dino_vision.py:38-49) vs char_attention_pool —
    against the real module, not the torch math transcription."""
    rng = np.random.default_rng(6)
    feats = rng.normal(size=(2, 16, 8, 32)).astype(np.float32)  # (N, E, H, W)
    clusters = np.zeros((2, 26, 32, 128), dtype=np.float32)
    clusters[:, 0, 4:10, 8:24] = 1.0
    clusters[:, 1, 12:20, 60:90] = 1.0
    with torch.no_grad():
        t_vecs, t_index = RefABIDINOModel.attention(
            None, torch.from_numpy(feats), torch.from_numpy(clusters))
    j_vecs, j_index = char_attention_pool(
        jnp.asarray(feats.transpose(0, 2, 3, 1)), jnp.asarray(clusters))
    np.testing.assert_allclose(np.asarray(j_vecs), t_vecs.numpy(), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(j_index), t_index.numpy())


def test_abidino_teacher_branch_parity():
    """Full teacher branch (clusters given, dino_vision.py:98-113): ragged
    reference outputs == our padded outputs gathered at the validity mask."""
    torch.manual_seed(7)
    backbone = ref_vits.vit_tiny(patch_size=4)
    head = ref_vits.DINOHead(192, 512, use_bn=False, norm_last_layer=True)
    ref = RefABIDINOModel(backbone, None, head).eval()

    sd = ref.state_dict()
    params, _stats = convert_pretrain_checkpoint(sd, branch="teacher", depth=12)

    rng = np.random.default_rng(7)
    b = 2
    x = rng.normal(size=(b, 3, 3, 32, 128)).astype(np.float32)  # (B, views, C, H, W)
    clusters = np.zeros((2 * b, 26, 32, 128), dtype=np.float32)
    for i in range(2 * b):
        n_chars = 2 + i % 3
        for c in range(n_chars):
            clusters[i, c, 6:26, 10 + 30 * c:30 + 30 * c] = 1.0

    with torch.no_grad():
        t_res = ref(torch.from_numpy(x), None, None, None,
                    clusters=torch.from_numpy(clusters), index=None)
    t_out = t_res["instances_view"].numpy()

    ours = CCDPretrainModel(arch="vit_tiny", out_dim=512, with_seg_head=False)
    xj = jnp.asarray(np.concatenate([x[:, 1], x[:, 2]]).transpose(0, 2, 3, 1))
    region_f, _ = ours.apply({"params": params}, xj, method="encode")
    j_logits, j_index = ours.apply({"params": params}, region_f,
                                   jnp.asarray(clusters), method="pool_project")
    valid = np.asarray(char_validity_mask(j_index[:b]))
    j_out = np.asarray(j_logits)
    j_ragged = np.concatenate([j_out[:b][valid], j_out[b:][valid]])
    np.testing.assert_allclose(j_ragged, t_out, atol=3e-4, rtol=1e-4)


# ------------------------------------------------------------------ finetune

def _finetune_config():
    return types.SimpleNamespace(
        arch="vit_tiny", patch_size=4, drop_path_rate=0.1,
        decoder_n_layers=6, decoder_d_embedding=512, decoder_n_head=8,
        decoder_d_k=64, decoder_d_v=64, decoder_d_model=512,
        decoder_d_inner=256, decoder_max_seq_len=25)


def test_dino_finetune_full_model_parity():
    """DINO_Finetune (dino_vision.py:135-290) end-to-end: teacher-forced
    logits, CE loss, greedy decode probs and token-for-token argmax."""
    torch.manual_seed(8)
    ref = RefDINOFinetune(_finetune_config()).eval()
    params = convert_recognizer_checkpoint(ref.state_dict())

    rng = np.random.default_rng(8)
    img = rng.normal(size=(2, 3, 32, 128)).astype(np.float32)
    tgt = rng.integers(0, 90, size=(2, 25)).astype(np.int64)
    tgt[:, 0] = 91
    tgt[0, 5:] = 92
    tgt[1, 9:] = 92

    with torch.no_grad():
        t_loss, t_attn = ref(torch.from_numpy(img), torch.from_numpy(tgt),
                             return_loss=True)
        t_probs = ref(torch.from_numpy(img), None, return_loss=False).numpy()

    ours = CCDRecognizer(arch="vit_tiny")
    imgj = jnp.asarray(img.transpose(0, 2, 3, 1))
    j_logits, j_attn = ours.apply({"params": params}, imgj,
                                  jnp.asarray(tgt.astype(np.int32)),
                                  train_mode=True, deterministic=True)
    j_probs = np.asarray(ours.apply({"params": params}, imgj, train_mode=False))

    # loss parity (TFLoss, ce_loss.py:94-128) vs our teacher-forcing CE
    from ccd_tpu.losses import tf_loss
    j_loss = tf_loss(j_logits, jnp.asarray(tgt.astype(np.int32)),
                     ignore_index=92)
    np.testing.assert_allclose(float(j_loss), float(t_loss), atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_attn), t_attn.numpy(), atol=1e-4)

    np.testing.assert_allclose(j_probs, t_probs, atol=1e-4)
    np.testing.assert_array_equal(j_probs.argmax(-1), t_probs.argmax(-1))


# ------------------------------------------------------------------ export
# (flax -> torch, the inverse direction: a ccd-tpu-TRAINED model must be
# loadable and bit-equivalent on the reference stack, round-3 VERDICT #4)

def test_export_recognizer_decodes_on_reference():
    """Train a CCDRecognizer a few steps, export via torch_export, strict-load
    into the reference's DINO_Finetune (dino_vision.py:135-290) and assert
    token-for-token greedy-decode + teacher-forced-logit parity."""
    from ccd_tpu.checkpoints.torch_export import export_recognizer_state_dict
    from ccd_tpu.training import init_finetune_state, make_finetune_step

    ours = CCDRecognizer(arch="vit_tiny")
    state, tx = init_finetune_state(jax.random.PRNGKey(42), ours)
    step = jax.jit(make_finetune_step(
        ours, tx, base_lr=1e-3, min_lr=1e-6, total_iters=10, warmup_iters=0,
        weight_decay=0.01, clip_grad=5.0))
    rng = np.random.default_rng(42)
    for i in range(2):
        img = jnp.asarray(rng.normal(size=(2, 32, 128, 3)).astype(np.float32))
        tgt = rng.integers(0, 90, size=(2, 25)).astype(np.int32)
        tgt[:, 0] = 91
        tgt[0, 6:] = 92
        tgt[1, 4:] = 92
        state, _ = step(state, img, jnp.asarray(tgt))
    params = jax.device_get(state.params)

    sd = export_recognizer_state_dict(params)
    ref = RefDINOFinetune(_finetune_config()).eval()
    # strict load: every reference parameter must be covered, name-for-name
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True)
    img = rng.normal(size=(2, 3, 32, 128)).astype(np.float32)
    with torch.no_grad():
        t_probs = ref(torch.from_numpy(img), None, return_loss=False).numpy()
    j_probs = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1)),
        train_mode=False))
    np.testing.assert_array_equal(j_probs.argmax(-1), t_probs.argmax(-1))
    np.testing.assert_allclose(j_probs, t_probs, atol=2e-4)


def test_export_pretrain_loads_on_reference_strict():
    """export_pretrain_state_dicts covers the reference ABIDINOModel's full
    state_dict name-for-name (strict=True), both branches (train.py:62-91)."""
    from ccd_tpu.checkpoints.torch_export import export_pretrain_state_dicts
    from ccd_tpu.training import init_pretrain_state

    student = CCDPretrainModel(arch="vit_tiny", out_dim=512,
                               with_seg_head=True, norm_last_layer=False)
    teacher = CCDPretrainModel(arch="vit_tiny", out_dim=512,
                               with_seg_head=False)
    state, _ = init_pretrain_state(jax.random.PRNGKey(3), student, teacher)
    sds = export_pretrain_state_dicts(
        jax.device_get(state.student_params),
        jax.device_get(state.teacher_params),
        jax.device_get(state.student_stats))

    t_backbone = ref_vits.vit_tiny(patch_size=4)
    t_head = ref_vits.DINOHead(192, 512, use_bn=False, norm_last_layer=False)
    t_seg = RefSegHead(in_channels=192, mla_channels=128, mlahead_channels=64,
                       num_classes=2)
    ref_student = RefABIDINOModel(t_backbone, t_seg, t_head)
    ref_student.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sds["student"].items()}, strict=True)
    ref_teacher = RefABIDINOModel(ref_vits.vit_tiny(patch_size=4), None,
                                  ref_vits.DINOHead(192, 512, use_bn=False))
    ref_teacher.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sds["teacher"].items()}, strict=True)

    # and the teacher forward agrees with ours (full branch, like
    # test_abidino_teacher_branch_parity but export-direction)
    rng = np.random.default_rng(9)
    b = 2
    x = rng.normal(size=(b, 3, 3, 32, 128)).astype(np.float32)  # (B, views, ...)
    clusters = np.zeros((2 * b, 26, 32, 128), dtype=np.float32)
    for i in range(2 * b):
        for c in range(2 + i % 2):
            clusters[i, c, 6:26, 10 + 30 * c:30 + 30 * c] = 1.0
    ref_teacher.eval()
    with torch.no_grad():
        t_res = ref_teacher(torch.from_numpy(x), None, None, None,
                            clusters=torch.from_numpy(clusters), index=None)
    t_out = t_res["instances_view"].numpy()

    xj = jnp.asarray(np.concatenate([x[:, 1], x[:, 2]]).transpose(0, 2, 3, 1))
    region_f, _ = teacher.apply({"params": state.teacher_params}, xj,
                                method="encode")
    j_logits, j_index = teacher.apply({"params": state.teacher_params},
                                      region_f, jnp.asarray(clusters),
                                      method="pool_project")
    valid = np.asarray(char_validity_mask(j_index[:b]))
    j_out = np.asarray(j_logits)
    j_ragged = np.concatenate([j_out[:b][valid], j_out[b:][valid]])
    np.testing.assert_allclose(j_ragged, t_out, atol=3e-4, rtol=1e-4)
