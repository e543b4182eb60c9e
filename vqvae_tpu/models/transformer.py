"""Decoder-only Transformer prior over code sequences.

Parity target: the reference GPT-style model (reference
src/models/transformer.py:10-133) — learned positional embeddings, optional
class conditioning by adding a class embedding to every position, pre-LN
blocks, causal MHA, GELU MLP (4x), bias-free output head, and N(0, 0.02)
init for dense/embedding weights.

TPU-first improvements over the reference:
- attention uses fused ``jax.nn.dot_product_attention`` semantics via Flax
  MHA with an explicit causal mask (no materialized tril buffer),
- autoregressive sampling uses a KV cache (flax ``decode=True``), which the
  reference lacks (reference src/scripts/generate_samples.py:23-31 re-runs
  the full prefix every step),
- compute dtype is configurable (bf16 matmuls / f32 params by default for
  training on TPU).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

_dense_init = nn.initializers.normal(stddev=0.02)


class Block(nn.Module):
    embed_dim: int
    n_head: int
    dropout: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False, decode: bool = False):
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head,
            qkv_features=self.embed_dim,
            dropout_rate=self.dropout,
            deterministic=not train,
            decode=decode,
            kernel_init=_dense_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="attn",
        )(h, h, mask=mask)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = x + h

        h = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        h = nn.Dense(4 * self.embed_dim, kernel_init=_dense_init,
                     dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.embed_dim, kernel_init=_dense_init,
                     dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return x + h


class Transformer(nn.Module):
    num_classes: int = 0
    num_tokens: int = 512
    embed_dim: int = 256
    n_layers: int = 4
    n_head: int = 4
    max_seq_len: int = 16
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        idx: jax.Array,  # (B, T) int32 token ids
        y: Optional[jax.Array] = None,  # (B,) int32 class labels
        train: bool = False,
        decode: bool = False,
        decode_index: Optional[jax.Array] = None,
    ) -> jax.Array:
        B, T = idx.shape
        assert T <= self.max_seq_len, f"seq len {T} > max {self.max_seq_len}"

        tok_emb = nn.Embed(self.num_tokens, self.embed_dim,
                           embedding_init=_dense_init,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="token_emb")(idx)
        pos_table = self.param("pos_emb", _dense_init,
                               (1, self.max_seq_len, self.embed_dim), jnp.float32)
        if decode and decode_index is not None:
            # single-token step at position decode_index (KV-cache path)
            pos_emb = jax.lax.dynamic_slice_in_dim(pos_table, decode_index, 1, axis=1)
        else:
            pos_emb = pos_table[:, :T, :]
        x = tok_emb + pos_emb.astype(tok_emb.dtype)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        if self.num_classes > 0 and y is not None:
            class_emb = nn.Embed(self.num_classes, self.embed_dim,
                                 embedding_init=_dense_init,
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name="class_emb")(y)
            x = x + class_emb[:, None, :]
        elif self.num_classes > 0:
            # materialize the table so params exist whether or not labels are fed
            nn.Embed(self.num_classes, self.embed_dim,
                     embedding_init=_dense_init,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="class_emb")(jnp.zeros((1,), jnp.int32))

        mask = None if decode else nn.make_causal_mask(idx)
        for i in range(self.n_layers):
            x = Block(self.embed_dim, self.n_head, self.dropout,
                      self.dtype, name=f"block_{i}")(x, mask=mask, train=train,
                                                     decode=decode)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="ln_f")(x)
        logits = nn.Dense(self.num_tokens, use_bias=False, kernel_init=_dense_init,
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="head")(x)
        return logits.astype(jnp.float32)

    def init_cache(self, batch_size: int):
        """Initialize the KV cache by tracing a full-length dummy decode."""
        dummy = jnp.zeros((batch_size, self.max_seq_len), jnp.int32)
        y = jnp.zeros((batch_size,), jnp.int32) if self.num_classes > 0 else None
        variables = self.init({"params": jax.random.key(0)}, dummy, y=y, decode=True)
        return variables["cache"]


def cross_entropy_loss(logits: jax.Array, targets: jax.Array,
                       mask: Optional[jax.Array] = None,
                       label_smoothing: float = 0.0) -> jax.Array:
    """Token-averaged cross entropy; ``mask`` (B,) excludes padded rows.

    Honors ``label_smoothing`` (the reference declares this knob in its
    transformer config but never consumes it — reference
    configs/.../transformer.yaml:19; here it is wired up).
    """
    vocab = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -logp.mean(axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    if mask is not None:
        w = mask[:, None] * jnp.ones_like(nll)
        return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)
    return nll.mean()
