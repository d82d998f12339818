"""Flax pytree -> PyTorch checkpoint conversion (the inverse of
``torch_import``).

Emits the exact pickle layouts the reference stack loads, so a ccd-tpu-trained
model can be cross-validated on the reference code with no released weights:

  * finetune: ``{'net': state_dict, 'iteration': int}`` — the layout
    ``test.py:165-173`` loads into ``DINO_Finetune`` and
    ``train_finetune.py:237-256`` resumes from;
  * pretrain: ``{'student': sd, 'teacher': sd, 'epoch': int,
    'iteration': int}`` — the layout ``train_finetune.py:191-200`` reads for
    the teacher->backbone handoff and ``restart_from_checkpoint``
    (``Dino/modules/utils.py:152-184``) resumes from.

Name/layout maps mirror ``torch_import`` transposed: flax (in, out) linears ->
torch (out, in); NHWC conv kernels (kh, kw, in, out) -> NCHW (out, in, kh, kw);
weight-norm ``last_layer_{g,v}`` -> ``weight_g/weight_v``; flax module names
``blocks_i``/``layer_i``/``mlp_j`` -> torch ``blocks.i``/``layer_stack.i``/
Sequential ``mlp.{0,2,4}`` indices.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _put(sd: Dict[str, np.ndarray], prefix: str, leaf: Dict[str, Any],
         transpose_kernel=None) -> None:
    """Write one flax Dense/LayerNorm-style leaf into torch naming."""
    if "kernel" in leaf:
        k = _np(leaf["kernel"])
        sd[f"{prefix}.weight"] = transpose_kernel(k) if transpose_kernel else k.T
        if "bias" in leaf:
            sd[f"{prefix}.bias"] = _np(leaf["bias"])
    elif "scale" in leaf:  # LayerNorm / BatchNorm params
        sd[f"{prefix}.weight"] = _np(leaf["scale"])
        sd[f"{prefix}.bias"] = _np(leaf["bias"])


def _conv_k(k: np.ndarray) -> np.ndarray:
    # flax (kh, kw, in, out) -> torch (out, in, kh, kw)
    return k.transpose(3, 2, 0, 1)


def _conv_transpose_k(k: np.ndarray) -> np.ndarray:
    # ours (kh, kw, in, out) -> torch (in, out, kh, kw)
    return k.transpose(2, 3, 0, 1)


def export_vit(p: Dict[str, Any], prefix: str = "backbone.",
               sd: Optional[Dict[str, np.ndarray]] = None) -> Dict[str, np.ndarray]:
    """Inverse of ``torch_import.convert_vit``."""
    sd = {} if sd is None else sd
    sd[f"{prefix}pos_embed"] = _np(p["pos_embed"])
    # the reference registers a cls_token Parameter but never prepends it
    # (vision_transformer.py:146,230-231 — the concat is commented out); our
    # no-CLS ViT has no equivalent, so a strict load gets zeros
    embed_dim = p["pos_embed"].shape[-1]
    sd[f"{prefix}cls_token"] = np.zeros((1, 1, embed_dim), np.float32)
    _put(sd, f"{prefix}patch_embed.proj", p["patch_embed"]["proj"], _conv_k)
    depth = sum(1 for k in p if k.startswith("blocks_"))
    for i in range(depth):
        bp, b = f"{prefix}blocks.{i}.", p[f"blocks_{i}"]
        _put(sd, f"{bp}norm1", b["norm1"])
        _put(sd, f"{bp}norm2", b["norm2"])
        _put(sd, f"{bp}attn.qkv", b["attn"]["qkv"])
        _put(sd, f"{bp}attn.proj", b["attn"]["proj"])
        _put(sd, f"{bp}mlp.fc1", b["mlp"]["fc1"])
        _put(sd, f"{bp}mlp.fc2", b["mlp"]["fc2"])
    _put(sd, f"{prefix}norm", p["norm"])
    for i in range(3):
        if f"norm_seg_{i}" in p:
            _put(sd, f"{prefix}norm_seg.{i}", p[f"norm_seg_{i}"])
    return sd


def export_dino_head(p: Dict[str, Any], prefix: str = "head.",
                     sd: Optional[Dict[str, np.ndarray]] = None
                     ) -> Dict[str, np.ndarray]:
    """Inverse of ``convert_dino_head``: Sequential mlp.{0,2,4} + weight_norm."""
    sd = {} if sd is None else sd
    nlayers = sum(1 for k in p if k.startswith("mlp_"))
    seq_idx = [0] + [2 * k for k in range(1, nlayers)]
    for j, si in enumerate(seq_idx):
        _put(sd, f"{prefix}mlp.{si}", p[f"mlp_{j}"])
    sd[f"{prefix}last_layer.weight_g"] = _np(p["last_layer_g"]).reshape(-1, 1)
    sd[f"{prefix}last_layer.weight_v"] = _np(p["last_layer_v"]).T
    return sd


def export_seg_head(p: Dict[str, Any], stats: Dict[str, Any],
                    prefix: str = "segmentation.",
                    sd: Optional[Dict[str, np.ndarray]] = None
                    ) -> Dict[str, np.ndarray]:
    """Inverse of ``convert_seg_head`` (params + batch_stats -> BN buffers).

    ``num_batches_tracked`` buffers are emitted as zeros: torch only reads
    them for momentum=None BN (the reference uses fixed momentum).
    """
    sd = {} if sd is None else sd

    def bn(tp: str, params: Dict, st: Dict) -> None:
        sd[f"{tp}.weight"] = _np(params["scale"])
        sd[f"{tp}.bias"] = _np(params["bias"])
        sd[f"{tp}.running_mean"] = _np(st["mean"])
        sd[f"{tp}.running_var"] = _np(st["var"])
        sd[f"{tp}.num_batches_tracked"] = np.zeros((), np.int64)

    for i in range(3):
        hp = f"{prefix}mlahead.head{i + 2}."
        h, hs = p[f"head{i + 2}"], stats[f"head{i + 2}"]
        _put(sd, f"{hp}0", h["conv1"], _conv_k)
        bn(f"{hp}1", h["bn1"], hs["bn1"])
        _put(sd, f"{hp}3", h["conv2"], _conv_k)
        bn(f"{hp}4", h["bn2"], hs["bn2"])
    for j in (1, 2):
        _put(sd, f"{prefix}unpool{j}.0", p[f"unpool{j}_conv"], _conv_transpose_k)
        bn(f"{prefix}unpool{j}.1", p[f"unpool{j}_bn"], stats[f"unpool{j}_bn"])
    _put(sd, f"{prefix}cls", p["cls"], _conv_k)

    # the reference constructs a Conv_MLA submodule it never calls
    # (segmentor.py:80 built, :90-95 forward skips it) — dead weights that
    # nonetheless live in its state_dict; emit deterministic identity-BN
    # filler so strict loads succeed. Channel count from head2.conv1
    # (in_channels) like the live path.
    c_in = _np(p["head2"]["conv1"]["kernel"]).shape[2]
    mla = _np(p["head2"]["conv1"]["kernel"]).shape[3]  # mla_channels (128)
    for nm, (ci, kk) in {"mla_p2_1x1": (c_in, 1), "mla_p3_1x1": (c_in, 1),
                         "mla_p4_1x1": (c_in, 1), "mla_p2": (mla, 3),
                         "mla_p3": (mla, 3), "mla_p4": (mla, 3)}.items():
        tp = f"{prefix}conv_mla.{nm}"
        sd[f"{tp}.0.weight"] = np.zeros((mla, ci, kk, kk), np.float32)
        sd[f"{tp}.1.weight"] = np.ones((mla,), np.float32)
        sd[f"{tp}.1.bias"] = np.zeros((mla,), np.float32)
        sd[f"{tp}.1.running_mean"] = np.zeros((mla,), np.float32)
        sd[f"{tp}.1.running_var"] = np.ones((mla,), np.float32)
        sd[f"{tp}.1.num_batches_tracked"] = np.zeros((), np.int64)
    return sd


def export_nrtr(p: Dict[str, Any], prefix: str = "decoder.",
                sd: Optional[Dict[str, np.ndarray]] = None
                ) -> Dict[str, np.ndarray]:
    """Inverse of ``convert_nrtr``."""
    sd = {} if sd is None else sd
    sd[f"{prefix}trg_word_emb.weight"] = _np(p["trg_word_emb"]["embedding"])
    # deterministic sinusoid buffer (transformer_module.py:136-153) — not a
    # flax param (our NRTR recomputes it), but part of the reference
    # state_dict, so a strict load needs it emitted
    from ccd_tpu.models.nrtr import sinusoid_table
    d_emb = p["trg_word_emb"]["embedding"].shape[-1]
    sd[f"{prefix}position_enc.position_table"] = \
        sinusoid_table(200, d_emb).astype(np.float32)
    n_layers = sum(1 for k in p if k.startswith("layer_") and k != "layer_norm")
    for i in range(n_layers):
        lp, l = f"{prefix}layer_stack.{i}.", p[f"layer_{i}"]
        for nm in ("norm1", "norm2", "norm3"):
            _put(sd, f"{lp}{nm}", l[nm])
        for attn in ("self_attn", "enc_attn"):
            for lin in ("linear_q", "linear_k", "linear_v", "fc"):
                _put(sd, f"{lp}{attn}.{lin}", l[attn][lin])
        _put(sd, f"{lp}mlp.w_1", l["mlp"]["w_1"])
        _put(sd, f"{lp}mlp.w_2", l["mlp"]["w_2"])
    _put(sd, f"{prefix}layer_norm", p["layer_norm"])
    _put(sd, f"{prefix}classifier", p["classifier"])
    return sd


def export_recognizer_state_dict(params: Dict[str, Any],
                                 module_prefix: bool = False
                                 ) -> Dict[str, np.ndarray]:
    """CCDRecognizer flax params -> DINO_Finetune state_dict.

    ``module_prefix``: prepend ``module.`` (the reference saves from a
    ``nn.DataParallel``-wrapped model, ``train_finetune.py:373-378``, and
    loads it back into one, so released-style checkpoints carry the prefix).
    """
    sd: Dict[str, np.ndarray] = {}
    export_vit(params["backbone"], "backbone.", sd)
    _put(sd, "encoder.fc1", params["encoder"]["fc1"])
    _put(sd, "encoder.fc2", params["encoder"]["fc2"])
    export_nrtr(params["decoder"], "decoder.", sd)
    if module_prefix:
        sd = {f"module.{k}": v for k, v in sd.items()}
    return sd


def export_pretrain_state_dicts(student_params: Dict[str, Any],
                                teacher_params: Dict[str, Any],
                                student_stats: Optional[Dict[str, Any]] = None
                                ) -> Dict[str, Dict[str, np.ndarray]]:
    """Pretrain param trees -> {'student': sd, 'teacher': sd} ABIDINOModel
    state_dicts (student carries the SegHead; teacher is backbone+head only,
    matching ``train.py:62-91``)."""
    student_sd: Dict[str, np.ndarray] = {}
    export_vit(student_params["backbone"], "backbone.", student_sd)
    export_dino_head(student_params["head"], "head.", student_sd)
    if "segmentation" in student_params:
        export_seg_head(student_params["segmentation"],
                        (student_stats or {}).get("segmentation", {}),
                        "segmentation.", student_sd)
    teacher_sd: Dict[str, np.ndarray] = {}
    export_vit(teacher_params["backbone"], "backbone.", teacher_sd)
    export_dino_head(teacher_params["head"], "head.", teacher_sd)
    return {"student": student_sd, "teacher": teacher_sd}


def _to_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    import torch
    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}


def save_recognizer_torch(params: Dict[str, Any], path: str,
                          iteration: int = 0, module_prefix: bool = False
                          ) -> None:
    """Write a ``{'net', 'iteration'}`` pickle loadable by the reference
    ``test.py:165-173`` / ``train_finetune.py:237-256``."""
    import torch
    sd = _to_torch(export_recognizer_state_dict(params, module_prefix))
    torch.save({"net": sd, "iteration": int(iteration)}, path)


def save_pretrain_torch(student_params: Dict[str, Any],
                        teacher_params: Dict[str, Any], path: str,
                        student_stats: Optional[Dict[str, Any]] = None,
                        epoch: int = 0, iteration: int = 0) -> None:
    """Write a pretrain-style pickle for the reference handoff
    (``train_finetune.py:191-200`` reads ``ckpt['teacher']`` by name-match)."""
    import torch
    sds = export_pretrain_state_dicts(student_params, teacher_params,
                                      student_stats)
    torch.save({"student": _to_torch(sds["student"]),
                "teacher": _to_torch(sds["teacher"]),
                "epoch": int(epoch), "iteration": int(iteration)}, path)
