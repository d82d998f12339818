"""Finetune/test recognition model: ViT backbone + Mlp encoder + NRTR decoder.

Parity target: ``DINO_Finetune`` (``Dino/model/dino_vision.py:135-290``):
backbone tokens -> Mlp(embed_dim -> 512) encoder -> NRTR decoder; train mode
is teacher-forced (returns logits + last-layer cross-attention for
visualization), test mode is greedy decoding returning per-step softmax
scores ``(B, max_seq_len, num_classes - 1)``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ccd_tpu.models.heads import MlpEncoder
from ccd_tpu.models.nrtr import NRTRDecoder
from ccd_tpu.models.vit import VIT_ARCHS

Dtype = Any


class CCDRecognizer(nn.Module):
    arch: str = "vit_small"
    patch_size: int = 4
    drop_path_rate: float = 0.1
    # decoder configuration (CCD_vision_model_*.yaml `decoder:` block)
    decoder_n_layers: int = 6
    decoder_d_embedding: int = 512
    decoder_n_head: int = 8
    decoder_d_k: int = 64
    decoder_d_v: int = 64
    decoder_d_model: int = 512
    decoder_d_inner: int = 256
    decoder_dropout: float = 0.1
    num_classes: int = 93      # AttnConvertor('DICT90', with_unknown=True).num_classes()
    max_seq_len: int = 25
    start_idx: int = 91
    padding_idx: int = 92
    encoder_drop: float = 0.1  # Mlp encoder dropout (dino_vision.py:163)
    dtype: Dtype = jnp.float32

    def setup(self):
        self.backbone = VIT_ARCHS[self.arch](
            patch_size=self.patch_size, drop_path_rate=self.drop_path_rate,
            dtype=self.dtype, name="backbone")
        # Mlp(embed_dim -> 512 -> 512) with GELU + dropout 0.1 (dino_vision.py:163)
        self.mlp_encoder = MlpEncoder(hidden_features=512, out_features=512,
                                      drop=self.encoder_drop,
                                      dtype=self.dtype, name="encoder")
        self.decoder = NRTRDecoder(
            n_layers=self.decoder_n_layers, d_embedding=self.decoder_d_embedding,
            n_head=self.decoder_n_head, d_k=self.decoder_d_k, d_v=self.decoder_d_v,
            d_model=self.decoder_d_model, d_inner=self.decoder_d_inner,
            n_position=200, dropout=self.decoder_dropout,
            num_classes=self.num_classes, max_seq_len=self.max_seq_len,
            start_idx=self.start_idx, padding_idx=self.padding_idx,
            dtype=self.dtype, name="decoder")

    def extract_feat(self, img, deterministic: bool = True):
        tokens, _ = self.backbone(img, deterministic=deterministic)
        return tokens

    def __call__(self, img, targets: Optional[jnp.ndarray] = None,
                 train_mode: bool = True, deterministic: bool = True,
                 test_speed: bool = False):
        """img: (B, 32, 128, 3) NHWC normalized images.

        train_mode=True: requires ``targets`` (B, T) padded target ids;
        returns (logits (B, T, C-1), cross_attn (B, H, T, 256)).
        train_mode=False: returns greedy per-step softmax (B, T, C-1);
        test_speed=True uses the early-exit decode (forward_test_speed).
        """
        feat = self.extract_feat(img, deterministic)
        out_enc = self.mlp_encoder(feat, deterministic=deterministic)
        if train_mode:
            return self.decoder(out_enc, targets, train_mode=True,
                                deterministic=deterministic)
        if test_speed:
            return self.decoder.decode_greedy_early_stop(out_enc)
        return self.decoder(out_enc, None, train_mode=False)
