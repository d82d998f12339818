"""PyTorch checkpoint -> flax pytree conversion for the released CCD weights.

The reference ships torch pickles (SURVEY.md §3.5):
  * pretrain: {'student','teacher','optimizer','epoch','iteration','dino_loss'}
    with ABIDINOModel state_dicts (backbone.* / segmentation.* / head.*),
  * finetune: {'net': DataParallel('module.'-prefixed) DINO_Finetune
    state_dict, 'optimizer', 'iteration'}.

This module maps those name/layout conventions (NCHW convs, (out,in) linears,
weight_norm g/v, Sequential indices) onto the ccd_tpu flax module tree so the
released ViT-Small/Base weights evaluate bit-compatibly (the 0.2%-word-acc
parity requirement, BASELINE.md).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    # always COPY: np.asarray on a float32 torch tensor shares memory, so a
    # later in-place torch update (optimizer.step, EMA) would silently mutate
    # the "converted" params
    return np.array(x, dtype=np.float32, copy=True)


def _linear(sd: Dict[str, Any], prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _conv(sd: Dict[str, Any], prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    # torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out)
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _conv_transpose(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    # torch convtranspose weight (in, out, kh, kw) -> ours (kh, kw, in, out)
    return {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 0, 1),
            "bias": _t(sd[f"{prefix}.bias"])}


def _bn(sd: Dict[str, Any], prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}
    stats = {"mean": _t(sd[f"{prefix}.running_mean"]),
             "var": _t(sd[f"{prefix}.running_var"])}
    return params, stats


def convert_vit(sd: Dict[str, Any], prefix: str = "backbone.", depth: int = 12
                ) -> Dict[str, Any]:
    """ViT state_dict -> flax params for models.vit.VisionTransformer."""
    p: Dict[str, Any] = {}
    p["pos_embed"] = _t(sd[f"{prefix}pos_embed"])
    p["patch_embed"] = {"proj": _conv(sd, f"{prefix}patch_embed.proj")}
    for i in range(depth):
        bp = f"{prefix}blocks.{i}."
        p[f"blocks_{i}"] = {
            "norm1": _layernorm(sd, f"{bp}norm1"),
            "norm2": _layernorm(sd, f"{bp}norm2"),
            "attn": {"qkv": _linear(sd, f"{bp}attn.qkv"),
                     "proj": _linear(sd, f"{bp}attn.proj")},
            "mlp": {"fc1": _linear(sd, f"{bp}mlp.fc1"),
                    "fc2": _linear(sd, f"{bp}mlp.fc2")},
        }
    p["norm"] = _layernorm(sd, f"{prefix}norm")
    for i in range(3):
        key = f"{prefix}norm_seg.{i}"
        if f"{key}.weight" in sd:
            p[f"norm_seg_{i}"] = _layernorm(sd, key)
    return p


def convert_dino_head(sd: Dict[str, Any], prefix: str = "head.", nlayers: int = 3
                      ) -> Dict[str, Any]:
    """DINOHead state_dict (Sequential mlp.0/2/4 + weight-normed last layer)."""
    p: Dict[str, Any] = {}
    # Sequential [Linear, GELU, Linear, GELU, Linear] -> torch indices 0,2,4
    seq_idx = [0] + [2 * k for k in range(1, nlayers)]
    for j, si in enumerate(seq_idx):
        p[f"mlp_{j}"] = _linear(sd, f"{prefix}mlp.{si}")
    # weight_norm: weight_g (out,1) -> (1,out); weight_v (out,in) -> (in,out)
    p["last_layer_g"] = _t(sd[f"{prefix}last_layer.weight_g"]).reshape(1, -1)
    p["last_layer_v"] = _t(sd[f"{prefix}last_layer.weight_v"]).T
    return p


def convert_seg_head(sd: Dict[str, Any], prefix: str = "segmentation."
                     ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """SegHead -> (params, batch_stats). conv_mla.* is defined-but-unused in
    the reference forward (segmentor.py:90-95) and is skipped."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(3):
        hp = f"{prefix}mlahead.head{i + 2}."
        c1 = _conv(sd, f"{hp}0", bias=False)
        b1p, b1s = _bn(sd, f"{hp}1")
        c2 = _conv(sd, f"{hp}3", bias=False)
        b2p, b2s = _bn(sd, f"{hp}4")
        params[f"head{i + 2}"] = {"conv1": c1, "bn1": b1p, "conv2": c2, "bn2": b2p}
        stats[f"head{i + 2}"] = {"bn1": b1s, "bn2": b2s}
    for j in (1, 2):
        params[f"unpool{j}_conv"] = _conv_transpose(sd, f"{prefix}unpool{j}.0")
        bp, bs = _bn(sd, f"{prefix}unpool{j}.1")
        params[f"unpool{j}_bn"] = bp
        stats[f"unpool{j}_bn"] = bs
    params["cls"] = _conv(sd, f"{prefix}cls")
    return params, stats


def convert_nrtr(sd: Dict[str, Any], prefix: str = "decoder.", n_layers: int = 6
                 ) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    p["trg_word_emb"] = {"embedding": _t(sd[f"{prefix}trg_word_emb.weight"])}
    for i in range(n_layers):
        lp = f"{prefix}layer_stack.{i}."
        p[f"layer_{i}"] = {
            "norm1": _layernorm(sd, f"{lp}norm1"),
            "norm2": _layernorm(sd, f"{lp}norm2"),
            "norm3": _layernorm(sd, f"{lp}norm3"),
            "self_attn": {
                "linear_q": _linear(sd, f"{lp}self_attn.linear_q"),
                "linear_k": _linear(sd, f"{lp}self_attn.linear_k"),
                "linear_v": _linear(sd, f"{lp}self_attn.linear_v"),
                "fc": _linear(sd, f"{lp}self_attn.fc"),
            },
            "enc_attn": {
                "linear_q": _linear(sd, f"{lp}enc_attn.linear_q"),
                "linear_k": _linear(sd, f"{lp}enc_attn.linear_k"),
                "linear_v": _linear(sd, f"{lp}enc_attn.linear_v"),
                "fc": _linear(sd, f"{lp}enc_attn.fc"),
            },
            "mlp": {"w_1": _linear(sd, f"{lp}mlp.w_1"),
                    "w_2": _linear(sd, f"{lp}mlp.w_2")},
        }
    p["layer_norm"] = _layernorm(sd, f"{prefix}layer_norm")
    p["classifier"] = _linear(sd, f"{prefix}classifier")
    return p


def _strip_module(sd: Dict[str, Any]) -> Dict[str, Any]:
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def convert_recognizer_checkpoint(ckpt_path_or_sd, n_layers: int = 6,
                                  depth: int = 12) -> Dict[str, Any]:
    """Finetune checkpoint ({'net': ...} or raw state_dict) -> flax params for
    models.recognizer.CCDRecognizer."""
    sd = _load(ckpt_path_or_sd)
    if "net" in sd and not any(k.startswith(("backbone", "module")) for k in sd):
        sd = sd["net"]
    sd = _strip_module(sd)
    params = {
        "backbone": convert_vit(sd, "backbone.", depth),
        "encoder": {"fc1": _linear(sd, "encoder.fc1"),
                    "fc2": _linear(sd, "encoder.fc2")},
        "decoder": convert_nrtr(sd, "decoder.", n_layers),
    }
    return params


def convert_pretrain_checkpoint(ckpt_path_or_sd, branch: str = "teacher",
                                depth: int = 12, nlayers_head: int = 3
                                ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Pretrain checkpoint -> (params, batch_stats) for CCDPretrainModel.

    ``branch``: 'teacher' (backbone+head) or 'student' (adds segmentation).
    DDP 'module.' prefixes are stripped.
    """
    ckpt = _load(ckpt_path_or_sd)
    sd = ckpt[branch] if branch in ckpt else ckpt
    sd = _strip_module(sd)
    params: Dict[str, Any] = {
        "backbone": convert_vit(sd, "backbone.", depth),
        "head": convert_dino_head(sd, "head.", nlayers_head),
    }
    stats: Dict[str, Any] = {}
    if any(k.startswith("segmentation.") for k in sd):
        seg_p, seg_s = convert_seg_head(sd, "segmentation.")
        params["segmentation"] = seg_p
        stats["segmentation"] = seg_s
    return params, stats


def _load(ckpt_path_or_sd) -> Dict[str, Any]:
    if isinstance(ckpt_path_or_sd, dict):
        return ckpt_path_or_sd
    import torch
    return torch.load(ckpt_path_or_sd, map_location="cpu", weights_only=False)
