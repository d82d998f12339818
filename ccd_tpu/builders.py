"""Config -> model/state builders shared by the entry-point CLIs."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from ccd_tpu.config import Config
from ccd_tpu.convertor import AttnConvertor
from ccd_tpu.models import CCDPretrainModel, CCDRecognizer
from ccd_tpu.checkpoints.torch_import import (
    convert_pretrain_checkpoint, convert_recognizer_checkpoint,
)


def compute_dtype(config: Config):
    name = getattr(config, "compute_dtype", None) or "float32"
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[str(name)]


def build_recognizer(config: Config) -> Tuple[CCDRecognizer, AttnConvertor]:
    """DINO_Finetune equivalent (dino_vision.py:135-183): the convertor's
    num_classes/start/padding ids override the config decoder block."""
    arch = str(config.arch).replace("deit", "vit")
    convertor = AttnConvertor(dict_type=config.dataset_charset_type or "DICT90",
                              max_seq_len=config.decoder_max_seq_len,
                              with_unknown=True)
    model = CCDRecognizer(
        arch=arch,
        patch_size=config.patch_size,
        drop_path_rate=config.drop_path_rate,
        decoder_n_layers=config.decoder_n_layers,
        decoder_d_embedding=config.decoder_d_embedding,
        decoder_n_head=config.decoder_n_head,
        decoder_d_k=config.decoder_d_k,
        decoder_d_v=config.decoder_d_v,
        decoder_d_model=config.decoder_d_model,
        decoder_d_inner=config.decoder_d_inner,
        num_classes=convertor.num_classes(),
        max_seq_len=config.decoder_max_seq_len,
        start_idx=convertor.start_idx,
        padding_idx=convertor.padding_idx,
        dtype=compute_dtype(config),
    )
    return model, convertor


def build_pretrain_models(config: Config) -> Tuple[CCDPretrainModel, CCDPretrainModel]:
    """Student (with SegHead + drop path) and teacher (plain), train.py:62-91."""
    arch = str(config.arch).replace("deit", "vit")
    dtype = compute_dtype(config)
    student = CCDPretrainModel(
        arch=arch, patch_size=config.patch_size,
        drop_path_rate=config.drop_path_rate, out_dim=config.out_dim,
        use_bn_in_head=bool(config.use_bn_in_head),
        norm_last_layer=bool(config.norm_last_layer), with_seg_head=True,
        remat=bool(config.remat), dtype=dtype)
    teacher = CCDPretrainModel(
        arch=arch, patch_size=config.patch_size, drop_path_rate=0.0,
        out_dim=config.out_dim, use_bn_in_head=bool(config.use_bn_in_head),
        norm_last_layer=True, with_seg_head=False, dtype=dtype)
    return student, teacher


def is_torch_checkpoint(path: str) -> bool:
    return os.path.isfile(path) and path.endswith((".pth", ".pt", ".bin"))


def load_recognizer_params(path: str, model: CCDRecognizer,
                           init_params: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Load finetune weights from a torch .pth, an Orbax pytree dir, a
    CheckpointManager root, or a single CheckpointManager step dir
    (``.../<step>`` as written by the finetune CLI)."""
    if is_torch_checkpoint(path):
        from ccd_tpu.models.vit import VIT_ARCHS
        depth = VIT_ARCHS[model.arch].keywords["depth"]
        return convert_recognizer_checkpoint(path, n_layers=model.decoder_n_layers,
                                             depth=depth)
    from ccd_tpu.checkpoints.orbax_io import CheckpointManager, restore_pytree
    norm = os.path.normpath(path)
    if os.path.isdir(norm) and os.path.basename(norm).isdigit():
        # a single manager step dir: restore via its parent manager
        mgr = CheckpointManager(os.path.dirname(norm))
        tree = mgr.restore(int(os.path.basename(norm)))
        mgr.close()
    elif os.path.isdir(norm) and any(d.isdigit() for d in os.listdir(norm)):
        mgr = CheckpointManager(norm)
        tree = mgr.restore(mgr.latest_step())
        mgr.close()
    else:
        tree = restore_pytree(path, init_params)
    return tree["params"] if isinstance(tree, dict) and "params" in tree else tree


def load_finetune_payload(path: str, template: Any) -> Optional[Dict[str, Any]]:
    """Restore a FULL finetune train-state payload ``{params, opt_state,
    iteration, best_accuracy}`` (``finetune_state_payload``) from an Orbax
    CheckpointManager root, a single step dir, or a raw pytree dir — the
    restart_from_checkpoint equivalent (reference train_finetune.py:237-256,
    which restores model + optimizer + iteration). Returns None when ``path``
    holds no full payload (a torch ``.pth`` or a params-only tree), so the
    caller falls back to the params-only load."""
    from ccd_tpu.checkpoints.orbax_io import CheckpointManager, restore_pytree
    if is_torch_checkpoint(path):
        return None
    norm = os.path.normpath(path)
    try:
        if os.path.isdir(norm) and os.path.basename(norm).isdigit():
            mgr = CheckpointManager(os.path.dirname(norm))
            tree = mgr.restore(int(os.path.basename(norm)), template)
            mgr.close()
        elif os.path.isdir(norm) and any(d.isdigit() for d in os.listdir(norm)):
            mgr = CheckpointManager(norm)
            tree = mgr.restore(mgr.latest_step(), template)
            mgr.close()
        else:
            tree = restore_pytree(norm, template)
    except Exception:
        return None
    if not isinstance(tree, dict) or "opt_state" not in tree:
        return None
    return tree


def load_pretrained_backbone(path: str, params: Dict[str, Any],
                             branch: str = "teacher") -> Dict[str, Any]:
    """Copy the pretrain checkpoint's backbone into recognizer params
    (the name-matched 'teacher' -> finetune handoff, train_finetune.py:191-200)."""
    src_params, _ = convert_pretrain_checkpoint(path, branch=branch) \
        if is_torch_checkpoint(path) else (_restore_pretrain(path), None)
    new = dict(params)
    new["backbone"] = src_params["backbone"]
    return new


def _restore_pretrain(path: str) -> Dict[str, Any]:
    """Restore pretrain params from an Orbax pytree dir or a
    CheckpointManager dir (the pretrain CLI's output)."""
    from ccd_tpu.checkpoints.orbax_io import CheckpointManager, restore_pytree
    # CheckpointManager layout: <dir>/<step>/default/...
    subdirs = [d for d in os.listdir(path) if d.isdigit()] \
        if os.path.isdir(path) else []
    if subdirs:
        mgr = CheckpointManager(path)
        tree = mgr.restore(mgr.latest_step())
        mgr.close()
    else:
        tree = restore_pytree(path)
    # the pretrain payload stores teacher_params = {backbone, head}
    if "teacher_params" in tree:
        return tree["teacher_params"]
    return tree
