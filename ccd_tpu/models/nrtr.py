"""NRTR transformer decoder for autoregressive text recognition.

Parity targets: ``Dino/decoder/nrtr_decoder.py`` (+ ``transformer_layers.py``,
``transformer_module.py``): 6 pre-norm decoder layers (self-attn, cross-attn,
FFN; separate q/k/v linears with d_k=d_v=64, no biases), char embedding,
sinusoid positional encoding, causal+pad target masks, and a classifier over
``num_classes - 1`` outputs (PAD is never predicted).

TPU-first redesign of inference: the reference greedily re-runs the FULL
decoder at every one of the 25 steps (``nrtr_decoder.py:151-175``). Here
greedy decoding is a single ``lax.scan`` with per-layer KV caches — exactly
output-equivalent (causal masking + the fact that PAD can never be produced
make incremental decoding bitwise-identical in exact arithmetic) at ~T x less
compute.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ccd_tpu.ops.activations import gelu as _gelu
from jax import lax

Dtype = Any

_dense_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)
_NEG_INF = -1e30




def sinusoid_table(n_position: int, d_hid: int) -> np.ndarray:
    """(1, n_position, d_hid) sinusoid table (transformer_module.py:141-153)."""
    denom = np.array([1.0 / np.power(10000, 2 * (j // 2) / d_hid) for j in range(d_hid)])
    table = np.arange(n_position)[:, None].astype(np.float64) * denom[None, :]
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    return table[None].astype(np.float32)


class MultiHeadAttention(nn.Module):
    """Separate-q/k/v multi-head attention (transformer_module.py:35-97)."""

    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    d_model: int = 512
    dropout: float = 0.1
    qkv_bias: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.linear_q = nn.Dense(self.n_head * self.d_k, use_bias=self.qkv_bias,
                                 kernel_init=_dense_init, dtype=self.dtype)
        self.linear_k = nn.Dense(self.n_head * self.d_k, use_bias=self.qkv_bias,
                                 kernel_init=_dense_init, dtype=self.dtype)
        self.linear_v = nn.Dense(self.n_head * self.d_v, use_bias=self.qkv_bias,
                                 kernel_init=_dense_init, dtype=self.dtype)
        self.fc = nn.Dense(self.d_model, use_bias=self.qkv_bias,
                           kernel_init=_dense_init, dtype=self.dtype)
        self.attn_drop = nn.Dropout(self.dropout)
        self.proj_drop = nn.Dropout(self.dropout)

    def q_heads(self, x):
        b, l, _ = x.shape
        return self.linear_q(x).reshape(b, l, self.n_head, self.d_k)

    def qkv_heads_packed(self, x):
        """q/k/v projections of the SAME input as ONE packed matmul.

        The three separate q/k/v linears (the reference's layout,
        ``transformer_module.py:35-55`` — kept so checkpoints map 1:1) are
        concatenated along the output axis at trace time, turning three
        back-to-back (B,L,D)x(D,H*dk) matmuls into one (D, 3*H*dk) matmul.
        Each output element is the identical dot product, so this is
        numerically equivalent; on TPU it cuts the decode step's op count
        and fills the MXU lanes (512 -> 1536 output width). Used by the
        incremental decode step and by self-attention in teacher-forced
        training (where q, k, v all come from the same normalized input).
        """
        if self.is_initializing():
            # params are created by the Dense calls themselves
            return self.q_heads(x), self.k_heads(x), self.v_heads(x)
        wq = self.linear_q.variables["params"]["kernel"]
        wk = self.linear_k.variables["params"]["kernel"]
        wv = self.linear_v.variables["params"]["kernel"]
        w = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
        out = x.astype(self.dtype) @ w
        if self.qkv_bias:
            out = out + jnp.concatenate(
                [self.linear_q.variables["params"]["bias"],
                 self.linear_k.variables["params"]["bias"],
                 self.linear_v.variables["params"]["bias"]]).astype(self.dtype)
        b, l, _ = x.shape
        nq, nk = self.n_head * self.d_k, self.n_head * self.d_k
        q = out[..., :nq].reshape(b, l, self.n_head, self.d_k)
        k = out[..., nq:nq + nk].reshape(b, l, self.n_head, self.d_k)
        v = out[..., nq + nk:].reshape(b, l, self.n_head, self.d_v)
        return q, k, v

    def kv_heads_packed(self, x):
        """k/v projections of the same input as one packed matmul (the
        cross-attention precompute over encoder tokens)."""
        if self.is_initializing():
            return self.k_heads(x), self.v_heads(x)
        wk = self.linear_k.variables["params"]["kernel"]
        wv = self.linear_v.variables["params"]["kernel"]
        w = jnp.concatenate([wk, wv], axis=1).astype(self.dtype)
        out = x.astype(self.dtype) @ w
        if self.qkv_bias:
            out = out + jnp.concatenate(
                [self.linear_k.variables["params"]["bias"],
                 self.linear_v.variables["params"]["bias"]]).astype(self.dtype)
        b, l, _ = x.shape
        nk = self.n_head * self.d_k
        k = out[..., :nk].reshape(b, l, self.n_head, self.d_k)
        v = out[..., nk:].reshape(b, l, self.n_head, self.d_v)
        return k, v

    def k_heads(self, x):
        b, l, _ = x.shape
        return self.linear_k(x).reshape(b, l, self.n_head, self.d_k)

    def v_heads(self, x):
        b, l, _ = x.shape
        return self.linear_v(x).reshape(b, l, self.n_head, self.d_v)

    def attend(self, q, k, v, mask: Optional[jnp.ndarray], deterministic: bool):
        """q: (B,Lq,H,dk), k/v: (B,Lk,H,d*), mask bool (broadcastable to
        (B,H,Lq,Lk), True=keep) -> (out (B,Lq,H,dv), attn (B,H,Lq,Lk))."""
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (self.d_k ** 0.5)
        if mask is not None:
            scores = jnp.where(mask, scores, _NEG_INF)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        attn = self.attn_drop(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        return out, attn

    def out_proj(self, out, deterministic: bool):
        b, l = out.shape[:2]
        out = self.fc(out.reshape(b, l, self.n_head * self.d_v))
        return self.proj_drop(out, deterministic=deterministic)

    def __call__(self, q_in, k_in, v_in, mask=None, deterministic: bool = True):
        out, attn = self.attend(self.q_heads(q_in), self.k_heads(k_in),
                                self.v_heads(v_in), mask, deterministic)
        return self.out_proj(out, deterministic), attn


class PositionwiseFeedForward(nn.Module):
    d_inner: int
    d_model: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.d_inner, kernel_init=_dense_init, dtype=self.dtype,
                     name="w_1")(x)
        x = _gelu(x)
        x = nn.Dense(self.d_model, kernel_init=_dense_init, dtype=self.dtype,
                     name="w_2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class TFDecoderLayer(nn.Module):
    """Pre-norm decoder layer (transformer_layers.py:149-162 order)."""

    d_model: int = 512
    d_inner: int = 256
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    dropout: float = 0.1
    qkv_bias: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm3 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.self_attn = MultiHeadAttention(self.n_head, self.d_k, self.d_v,
                                            self.d_model, self.dropout, self.qkv_bias,
                                            dtype=self.dtype)
        self.enc_attn = MultiHeadAttention(self.n_head, self.d_k, self.d_v,
                                           self.d_model, self.dropout, self.qkv_bias,
                                           dtype=self.dtype)
        self.mlp = PositionwiseFeedForward(self.d_inner, self.d_model, self.dropout,
                                           dtype=self.dtype)

    def __call__(self, x, enc, self_mask=None, enc_mask=None,
                 deterministic: bool = True):
        n = self.norm1(x)
        q, k, v = self.self_attn.qkv_heads_packed(n)
        a, _ = self.self_attn.attend(q, k, v, self_mask, deterministic)
        x = x + self.self_attn.out_proj(a, deterministic)
        n = self.norm2(x)
        ek, ev = self.enc_attn.kv_heads_packed(enc)
        a, attn = self.enc_attn.attend(self.enc_attn.q_heads(n), ek, ev,
                                       enc_mask, deterministic)
        x = x + self.enc_attn.out_proj(a, deterministic)
        x = x + self.mlp(self.norm3(x), deterministic)
        return x, attn

    def step(self, x, cache_k, cache_v, t, enc_k, enc_v, key_mask,
             deterministic: bool = True):
        """Incremental step: x (B,1,D) at position t with per-layer KV cache.

        cache_k/v: (B, L, H, d*) — position t is written, keys > t are masked.
        """
        n = self.norm1(x)
        q, k_new, v_new = self.self_attn.qkv_heads_packed(n)
        cache_k = cache_k.at[:, t].set(k_new[:, 0])
        cache_v = cache_v.at[:, t].set(v_new[:, 0])
        a, _ = self.self_attn.attend(q, cache_k, cache_v, key_mask, deterministic)
        x = x + self.self_attn.out_proj(a, deterministic)
        n = self.norm2(x)
        a, attn = self.enc_attn.attend(self.enc_attn.q_heads(n), enc_k, enc_v, None,
                                       deterministic)
        x = x + self.enc_attn.out_proj(a, deterministic)
        x = x + self.mlp(self.norm3(x), deterministic)
        return x, cache_k, cache_v


class NRTRDecoder(nn.Module):
    n_layers: int = 6
    d_embedding: int = 512
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    d_model: int = 512
    d_inner: int = 256
    n_position: int = 200
    dropout: float = 0.1
    num_classes: int = 93
    max_seq_len: int = 25
    start_idx: int = 91
    padding_idx: int = 92
    dtype: Dtype = jnp.float32

    def setup(self):
        self.trg_word_emb = nn.Embed(self.num_classes, self.d_embedding,
                                     embedding_init=nn.initializers.normal(1.0),
                                     dtype=self.dtype)
        self.pos_table = jnp.asarray(sinusoid_table(self.n_position, self.d_embedding))
        self.emb_drop = nn.Dropout(self.dropout)
        self.layer_stack = [
            TFDecoderLayer(self.d_model, self.d_inner, self.n_head, self.d_k,
                           self.d_v, self.dropout, dtype=self.dtype,
                           name=f"layer_{i}")
            for i in range(self.n_layers)
        ]
        self.layer_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        # PAD is assumed and never predicted (nrtr_decoder.py:76-77)
        self.classifier = nn.Dense(self.num_classes - 1, kernel_init=_dense_init,
                                   dtype=self.dtype)

    def __call__(self, out_enc, targets=None, train_mode: bool = True,
                 deterministic: bool = True):
        if train_mode:
            return self.forward_train(out_enc, targets, deterministic)
        return self.decode_greedy(out_enc)

    # ------------------------------------------------------------- train
    def forward_train(self, out_enc, targets, deterministic: bool = True
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Teacher-forced decode: (B, S, Dm) enc + (B, T) targets -> (B, T, C-1)."""
        b, t = targets.shape
        emb = self.trg_word_emb(targets) + self.pos_table[:, :t].astype(self.dtype)
        x = self.emb_drop(emb, deterministic=deterministic)

        pad_mask = (targets != self.padding_idx)[:, None, None, :]  # key mask
        causal = jnp.tril(jnp.ones((t, t), dtype=bool))[None, None]
        self_mask = pad_mask & causal

        attn = None
        for layer in self.layer_stack:
            x, attn = layer(x, out_enc, self_mask, None, deterministic)
        x = self.layer_norm(x)
        return self.classifier(x), attn

    # ------------------------------------------------------------- greedy
    def decode_greedy(self, out_enc) -> jnp.ndarray:
        """KV-cached greedy decode -> (B, max_seq_len, C-1) per-step softmax.

        Output-equivalent to the reference full-recompute loop
        (nrtr_decoder.py:151-175): the reference seeds [BOS, PAD, ...] and the
        pad+causal mask restricts position t to keys <= t that are non-PAD;
        generated tokens can never be PAD (classifier has no PAD output), so
        incremental decoding attends to exactly the same keys.
        """
        b, s, _ = out_enc.shape
        l = self.max_seq_len + 1
        h, dk, dv = self.n_head, self.d_k, self.d_v

        enc_kvs = [lyr.enc_attn.kv_heads_packed(out_enc) for lyr in self.layer_stack]
        enc_ks = jnp.stack([k for k, _ in enc_kvs])
        enc_vs = jnp.stack([v for _, v in enc_kvs])

        cache_k0 = jnp.zeros((self.n_layers, b, l, h, dk), self.dtype)
        cache_v0 = jnp.zeros((self.n_layers, b, l, h, dv), self.dtype)
        tok0 = jnp.full((b,), self.start_idx, jnp.int32)
        positions = jnp.arange(l)

        def step(carry, t):
            tok, ck, cv = carry
            x = (self.trg_word_emb(tok)[:, None]
                 + lax.dynamic_slice_in_dim(self.pos_table, t, 1, axis=1).astype(self.dtype))
            key_mask = (positions <= t)[None, None, None, :]
            new_ck, new_cv = [], []
            for i, layer in enumerate(self.layer_stack):
                x, k_i, v_i = layer.step(x, ck[i], cv[i], t, enc_ks[i], enc_vs[i],
                                         key_mask, deterministic=True)
            # NOTE: layer.step returns updated caches; collect them
                new_ck.append(k_i)
                new_cv.append(v_i)
            x = self.layer_norm(x)
            probs = jax.nn.softmax(self.classifier(x[:, 0]).astype(jnp.float32), axis=-1)
            nxt = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            return (nxt, jnp.stack(new_ck), jnp.stack(new_cv)), probs

        _, probs = lax.scan(step, (tok0, cache_k0, cache_v0),
                            jnp.arange(self.max_seq_len))
        return jnp.transpose(probs, (1, 0, 2))  # (B, T, C-1)

    def decode_greedy_early_stop(self, out_enc) -> jnp.ndarray:
        """Early-exit greedy decode (the ``forward_test_speed`` counterpart,
        nrtr_decoder.py:177-203): a ``lax.while_loop`` that stops as soon as
        every sequence in the batch has emitted EOS (a saner stopping rule
        than the reference's batch-global argmax check). Output is the same
        fixed (B, max_seq_len, C-1) buffer; steps after the stop stay zero.

        Observable difference vs the reference rule: NONE at b=1 (both stop
        at the first EOS; asserted token-for-token by
        ``test_nrtr_early_stop_parity_b1``). For b>1 the reference stops
        when the argmax over the batch-flattened logits lands on EOS — a
        data-dependent heuristic that can truncate still-running rows or
        overrun finished ones; this variant instead runs until every row
        has emitted EOS, so rows never truncate early but trailing
        positions of short rows stay zero rather than containing the
        reference's post-EOS garbage logits. The default eval path uses
        the exact full decode and is unaffected (``--test_speed`` only).
        """
        b, s, _ = out_enc.shape
        l = self.max_seq_len + 1
        h, dk, dv = self.n_head, self.d_k, self.d_v
        enc_kvs = [lyr.enc_attn.kv_heads_packed(out_enc) for lyr in self.layer_stack]
        enc_ks = jnp.stack([k for k, _ in enc_kvs])
        enc_vs = jnp.stack([v for _, v in enc_kvs])
        positions = jnp.arange(l)

        def cond(carry):
            t, _tok, _ck, _cv, _probs, done = carry
            return (t < self.max_seq_len) & ~jnp.all(done)

        def body(carry):
            t, tok, ck, cv, probs_buf, done = carry
            x = (self.trg_word_emb(tok)[:, None]
                 + lax.dynamic_slice_in_dim(self.pos_table, t, 1, axis=1
                                            ).astype(self.dtype))
            key_mask = (positions <= t)[None, None, None, :]
            new_ck, new_cv = [], []
            for i, layer in enumerate(self.layer_stack):
                x, k_i, v_i = layer.step(x, ck[i], cv[i], t, enc_ks[i], enc_vs[i],
                                         key_mask, deterministic=True)
                new_ck.append(k_i)
                new_cv.append(v_i)
            x = self.layer_norm(x)
            probs = jax.nn.softmax(self.classifier(x[:, 0]).astype(jnp.float32),
                                   axis=-1)
            nxt = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            probs_buf = probs_buf.at[:, t].set(probs)
            done = done | (nxt == self.end_token_id)
            return (t + 1, nxt, jnp.stack(new_ck), jnp.stack(new_cv), probs_buf, done)

        init = (jnp.int32(0), jnp.full((b,), self.start_idx, jnp.int32),
                jnp.zeros((self.n_layers, b, l, h, dk), self.dtype),
                jnp.zeros((self.n_layers, b, l, h, dv), self.dtype),
                jnp.zeros((b, self.max_seq_len, self.num_classes - 1), jnp.float32),
                jnp.zeros((b,), bool))
        *_, probs_buf, _ = lax.while_loop(cond, body, init)
        return probs_buf

    @property
    def end_token_id(self) -> int:
        # BOS/EOS share an id in the default convertor layout (id 91)
        return self.start_idx
