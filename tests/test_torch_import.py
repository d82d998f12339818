"""Checkpoint-converter parity: torch models with reference-exact module
names/layouts -> convert -> flax forward must match torch forward.

These torch "twins" are built from the architecture spec (SURVEY.md §2.5),
not copied code; they produce state_dicts with the same key names and tensor
layouts as the reference checkpoints, which is what the converter consumes.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from ccd_tpu.checkpoints.torch_import import (  # noqa: E402
    convert_dino_head, convert_nrtr, convert_pretrain_checkpoint,
    convert_recognizer_checkpoint, convert_seg_head, convert_vit,
)
from ccd_tpu.models import CCDRecognizer, DINOHead, NRTRDecoder, SegHead  # noqa: E402
from ccd_tpu.models.vit import VisionTransformer  # noqa: E402


# ------------------------------------------------------------- torch twins

class TorchViT(tnn.Module):
    """Reference-shaped ViT (no CLS, rect grid, norm_seg taps)."""

    def __init__(self, embed_dim=96, depth=3, num_heads=3, patch=4,
                 out_indices=(1, 2, 3)):
        super().__init__()
        self.patch = patch
        self.out_indices = out_indices
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, embed_dim, patch, patch)
        self.pos_embed = tnn.Parameter(torch.randn(1, 8 * 32, embed_dim) * 0.02)
        self.blocks = tnn.ModuleList()
        for _ in range(depth):
            blk = tnn.Module()
            blk.norm1 = tnn.LayerNorm(embed_dim, eps=1e-6)
            blk.attn = tnn.Module()
            blk.attn.num_heads = num_heads
            blk.attn.qkv = tnn.Linear(embed_dim, embed_dim * 3, bias=True)
            blk.attn.proj = tnn.Linear(embed_dim, embed_dim)
            blk.norm2 = tnn.LayerNorm(embed_dim, eps=1e-6)
            blk.mlp = tnn.Module()
            blk.mlp.fc1 = tnn.Linear(embed_dim, embed_dim * 4)
            blk.mlp.fc2 = tnn.Linear(embed_dim * 4, embed_dim)
            self.blocks.append(blk)
        self.norm = tnn.LayerNorm(embed_dim, eps=1e-6)
        self.norm_seg = tnn.Sequential(*[tnn.LayerNorm(embed_dim, eps=1e-6)
                                         for _ in range(len(out_indices))])

    def forward(self, x):
        b, _, h, w = x.shape
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        n = self.pos_embed.shape[1]
        s = int(math.sqrt(n))
        gh, gw = h // self.patch, w // self.patch
        pe = F.interpolate(
            self.pos_embed.reshape(1, s, s, -1).permute(0, 3, 1, 2),
            scale_factor=((gh + 0.1) / s, (gw + 0.1) / s), mode="bicubic",
            recompute_scale_factor=False,
        ).permute(0, 2, 3, 1).reshape(1, -1, t.shape[-1])
        t = t + pe
        taps = []
        j = 0
        for i, blk in enumerate(self.blocks):
            nh = blk.attn.num_heads
            bb, nn_, c = t.shape
            qkv = blk.attn.qkv(blk.norm1(t)).reshape(bb, nn_, 3, nh, c // nh)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * (c // nh) ** -0.5
            attn = attn.softmax(-1)
            y = (attn @ v).transpose(1, 2).reshape(bb, nn_, c)
            t = t + blk.attn.proj(y)
            t = t + blk.mlp.fc2(F.gelu(blk.mlp.fc1(blk.norm2(t))))
            if i + 1 in self.out_indices:
                taps.append(self.norm_seg[j](t).reshape(bb, gh, gw, c))
                j += 1
        return self.norm(t), taps


class TorchDINOHead(tnn.Module):
    def __init__(self, in_dim=96, out_dim=256, hidden=64, bottleneck=32):
        super().__init__()
        self.mlp = tnn.Sequential(
            tnn.Linear(in_dim, hidden), tnn.GELU(),
            tnn.Linear(hidden, hidden), tnn.GELU(),
            tnn.Linear(hidden, bottleneck))
        self.last_layer = tnn.utils.weight_norm(
            tnn.Linear(bottleneck, out_dim, bias=False))
        self.last_layer.weight_g.data.fill_(1)

    def forward(self, x):
        x = self.mlp(x)
        x = F.normalize(x, dim=-1, p=2)
        return self.last_layer(x)


class TorchSegHead(tnn.Module):
    def __init__(self, in_ch=96, mla=32, mlahead=16, ncls=2):
        super().__init__()
        self.mlahead = tnn.Module()
        for i in (2, 3, 4):
            setattr(self.mlahead, f"head{i}", tnn.Sequential(
                tnn.Conv2d(in_ch, mla, 3, padding=1, bias=False),
                tnn.BatchNorm2d(mla), tnn.ReLU(),
                tnn.Conv2d(mla, mlahead, 1, bias=False),
                tnn.BatchNorm2d(mlahead), tnn.ReLU()))
        cat = mlahead * 3
        self.unpool1 = tnn.Sequential(tnn.ConvTranspose2d(cat, 128, 4, 2, 1),
                                      tnn.BatchNorm2d(128), tnn.ReLU(True))
        self.unpool2 = tnn.Sequential(tnn.ConvTranspose2d(128, 128, 4, 2, 1),
                                      tnn.BatchNorm2d(128), tnn.ReLU(True))
        self.cls = tnn.Conv2d(128, ncls, 3, padding=1)

    def forward(self, taps):
        x = torch.cat([self.mlahead.head2(taps[0]), self.mlahead.head3(taps[1]),
                       self.mlahead.head4(taps[2])], dim=1)
        return self.cls(self.unpool2(self.unpool1(x)))


class TorchNRTR(tnn.Module):
    def __init__(self, n_layers=2, d_model=64, n_head=4, d_k=16, d_v=16,
                 d_inner=32, num_classes=93, pad=92, n_position=200):
        super().__init__()
        self.pad = pad
        self.trg_word_emb = tnn.Embedding(num_classes, d_model, padding_idx=pad)
        denom = torch.tensor([1.0 / np.power(10000, 2 * (j // 2) / d_model)
                              for j in range(d_model)]).float().view(1, -1)
        pos = torch.arange(n_position).unsqueeze(-1).float() * denom
        pos[:, 0::2] = torch.sin(pos[:, 0::2])
        pos[:, 1::2] = torch.cos(pos[:, 1::2])
        self.register_buffer("position_table", pos.unsqueeze(0))
        self.layer_stack = tnn.ModuleList()
        for _ in range(n_layers):
            lyr = tnn.Module()
            for nm in ("norm1", "norm2", "norm3"):
                setattr(lyr, nm, tnn.LayerNorm(d_model))
            for attn_name in ("self_attn", "enc_attn"):
                a = tnn.Module()
                a.linear_q = tnn.Linear(n_head * d_k, n_head * d_k, bias=False)
                a.linear_k = tnn.Linear(n_head * d_k, n_head * d_k, bias=False)
                a.linear_v = tnn.Linear(n_head * d_v, n_head * d_v, bias=False)
                a.fc = tnn.Linear(n_head * d_v, d_model, bias=False)
                a.n_head, a.d_k, a.d_v = n_head, d_k, d_v
                setattr(lyr, attn_name, a)
            lyr.mlp = tnn.Module()
            lyr.mlp.w_1 = tnn.Linear(d_model, d_inner)
            lyr.mlp.w_2 = tnn.Linear(d_inner, d_model)
            self.layer_stack.append(lyr)
        self.layer_norm = tnn.LayerNorm(d_model, eps=1e-6)
        self.classifier = tnn.Linear(d_model, num_classes - 1)

    @staticmethod
    def _mha(a, q, k, v, mask):
        b, lq, _ = q.shape
        lk = k.shape[1]
        qh = a.linear_q(q).view(b, lq, a.n_head, a.d_k).transpose(1, 2)
        kh = a.linear_k(k).view(b, lk, a.n_head, a.d_k).transpose(1, 2)
        vh = a.linear_v(v).view(b, lk, a.n_head, a.d_v).transpose(1, 2)
        s = qh @ kh.transpose(2, 3) / a.d_k ** 0.5
        if mask is not None:
            s = s.masked_fill(mask == 0, float("-inf"))
        attn = F.softmax(s, dim=-1)
        out = (attn @ vh).transpose(1, 2).reshape(b, lq, a.n_head * a.d_v)
        return a.fc(out)

    def forward(self, enc, targets):
        b, t = targets.shape
        x = self.trg_word_emb(targets) + self.position_table[:, :t]
        pad_mask = (targets != self.pad).unsqueeze(-2)
        causal = (1 - torch.triu(torch.ones(t, t), diagonal=1)).bool().unsqueeze(0)
        mask = (pad_mask & causal).unsqueeze(1)
        for lyr in self.layer_stack:
            n = lyr.norm1(x)
            x = x + self._mha(lyr.self_attn, n, n, n, mask)
            n = lyr.norm2(x)
            x = x + self._mha(lyr.enc_attn, n, enc, enc, None)
            x = x + lyr.mlp.w_2(F.gelu(lyr.mlp.w_1(lyr.norm3(x))))
        return self.classifier(self.layer_norm(x))


# ------------------------------------------------------------- tests

def test_vit_conversion_parity():
    tm = TorchViT().eval()
    sd = {f"backbone.{k}": v for k, v in tm.state_dict().items()}
    params = convert_vit(sd, "backbone.", depth=3)

    model = VisionTransformer(embed_dim=96, depth=3, num_heads=3, patch_size=4,
                              qkv_bias=True, out_indices=(1, 2, 3))
    x = np.random.default_rng(0).normal(size=(2, 3, 32, 128)).astype(np.float32)
    with torch.no_grad():
        ref_tokens, ref_taps = tm(torch.from_numpy(x))
    tokens, taps = model.apply({"params": params},
                               jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(tokens), ref_tokens.numpy(), atol=2e-4)
    for a, b in zip(taps, ref_taps):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-4)


def test_dino_head_conversion_parity():
    tm = TorchDINOHead().eval()
    sd = {f"head.{k}": v for k, v in tm.state_dict().items()}
    params = convert_dino_head(sd, "head.")
    head = DINOHead(out_dim=256, hidden_dim=64, bottleneck_dim=32,
                    norm_last_layer=False)
    x = np.random.default_rng(1).normal(size=(4, 96)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    out = head.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_seg_head_conversion_parity():
    tm = TorchSegHead().eval()
    sd = {f"segmentation.{k}": v for k, v in tm.state_dict().items()}
    params, stats = convert_seg_head(sd, "segmentation.")
    head = SegHead(mla_channels=32, mlahead_channels=16)
    rng = np.random.default_rng(2)
    taps = [rng.normal(size=(2, 8, 32, 96)).astype(np.float32) for _ in range(3)]
    with torch.no_grad():
        ref = tm([torch.from_numpy(t.transpose(0, 3, 1, 2)) for t in taps]).numpy()
    out = head.apply({"params": params, "batch_stats": stats},
                     [jnp.asarray(t) for t in taps], train=False)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_nrtr_conversion_parity():
    tm = TorchNRTR().eval()
    sd = {f"decoder.{k}": v for k, v in tm.state_dict().items()}
    params = convert_nrtr(sd, "decoder.", n_layers=2)
    dec = NRTRDecoder(n_layers=2, d_embedding=64, n_head=4, d_k=16, d_v=16,
                      d_model=64, d_inner=32, num_classes=93, max_seq_len=6,
                      start_idx=91, padding_idx=92)
    rng = np.random.default_rng(3)
    enc = rng.normal(size=(2, 10, 64)).astype(np.float32)
    targets = np.array([[91, 5, 6, 91, 92, 92], [91, 1, 91, 92, 92, 92]], np.int64)
    with torch.no_grad():
        ref = tm(torch.from_numpy(enc), torch.from_numpy(targets)).numpy()
    logits, _ = dec.apply({"params": params}, jnp.asarray(enc),
                          jnp.asarray(targets.astype(np.int32)), train_mode=True)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=1e-4)


def test_full_recognizer_checkpoint_conversion():
    """Full finetune-checkpoint layout ('net' + DataParallel 'module.')."""
    vit = TorchViT()
    enc_fc1 = tnn.Linear(96, 512)
    enc_fc2 = tnn.Linear(512, 512)
    dec = TorchNRTR(d_model=512, n_head=8, d_k=64, d_v=64, d_inner=256)
    sd = {}
    for k, v in vit.state_dict().items():
        sd[f"module.backbone.{k}"] = v
    for k, v in enc_fc1.state_dict().items():
        sd[f"module.encoder.fc1.{k}"] = v
    for k, v in enc_fc2.state_dict().items():
        sd[f"module.encoder.fc2.{k}"] = v
    for k, v in dec.state_dict().items():
        sd[f"module.decoder.{k}"] = v
    params = convert_recognizer_checkpoint({"net": sd}, n_layers=2, depth=3)
    assert set(params) == {"backbone", "encoder", "decoder"}

    # run the full converted model end to end (greedy decode)
    model = CCDRecognizer(arch="vit_tiny", max_seq_len=6, decoder_n_layers=2)
    # vit_tiny has different dims than the twin — only check tree structure
    # compatibility here for the tiny twin (full numeric parity covered by the
    # per-component tests above)
    assert "blocks_0" in params["backbone"]
    assert "layer_0" in params["decoder"]
    assert params["decoder"]["classifier"]["kernel"].shape == (512, 92)


def test_pretrain_checkpoint_conversion_branches():
    vit = TorchViT()
    head = TorchDINOHead()
    seg = TorchSegHead()
    teacher_sd = {}
    for k, v in vit.state_dict().items():
        teacher_sd[f"backbone.{k}"] = v
    for k, v in head.state_dict().items():
        teacher_sd[f"head.{k}"] = v
    student_sd = dict(teacher_sd)
    for k, v in seg.state_dict().items():
        student_sd[f"module.segmentation.{k}"] = v
    ckpt = {"teacher": teacher_sd, "student": student_sd, "epoch": 3}
    t_params, t_stats = convert_pretrain_checkpoint(ckpt, "teacher", depth=3)
    assert set(t_params) == {"backbone", "head"} and t_stats == {}
    s_params, s_stats = convert_pretrain_checkpoint(ckpt, "student", depth=3)
    assert "segmentation" in s_params and "segmentation" in s_stats
