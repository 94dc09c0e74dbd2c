"""List / sequence categorical inputs (session & behavior histories).

Parity with ``/root/reference/torecsys/inputs/base/``:

* :class:`ListIndicesEmbedding`     — ``list_indices_emb.py:12-210`` (unordered
  id list → embed → optional self-attention → aggregation)
* :class:`SequenceIndicesEmbedding` — ``sequence_indices_emb.py:11-171``
  (ordered sequence → embed → RNN/LSTM/GRU → aggregation)

TPU design (SURVEY.md §5.7): sequences are fixed max-length with a length
mask — the reference's sort / ``pack_padded_sequence`` / desort dance
(``sequence_indices_emb.py:129-139``) collapses to a mask under XLA's static
shapes. The recurrent cores run as ``lax.scan`` via ``flax.linen.RNN``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from torecsys_tpu.inputs.base import BaseInput, Batch
from torecsys_tpu.parallel.lookup import maybe_sharded_lookup


def _length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """``(B,) lengths → (B, L)`` boolean validity mask."""
    pos = jnp.arange(max_len)[None, :]
    return pos < lengths[:, None]


def _aggregate(x: jnp.ndarray, mask: Optional[jnp.ndarray], output_method: str) -> jnp.ndarray:
    """Pool ``(B, L, E)`` over L per ``output_method``; ``mask`` is ``(B, L)``.

    Methods mirror the reference (``list_indices_emb.py`` / ``sequence_indices_emb.py``):
    ``avg_pooling | max_pooling | mean | sum | none``.  ``none`` returns the
    full (masked) ``(B, L, E)``; everything else returns ``(B, 1, E)``.
    """
    if mask is not None:
        x = jnp.where(mask[..., None], x, jnp.zeros((), dtype=x.dtype))
    if output_method == "none":
        return x
    if output_method in ("avg_pooling", "mean"):
        if mask is None:
            return jnp.mean(x, axis=1, keepdims=True)
        denom = jnp.maximum(jnp.sum(mask, axis=1), 1)[:, None, None].astype(x.dtype)
        return jnp.sum(x, axis=1, keepdims=True) / denom
    if output_method == "max_pooling":
        if mask is not None:
            neg = jnp.asarray(jnp.finfo(x.dtype).min, dtype=x.dtype)
            x = jnp.where(mask[..., None], x, neg)
        return jnp.max(x, axis=1, keepdims=True)
    if output_method == "sum":
        return jnp.sum(x, axis=1, keepdims=True)
    raise ValueError(f"unknown output_method {output_method!r}")


class ListIndicesEmbedding(BaseInput):
    """Unordered id-list input → embed → optional self-attention → pooled.

    Reference: ``list_indices_emb.py:12-210``.  ``use_attn`` enables a
    multi-head dot-product self-attention over the list (the reference's
    ``nn.MultiheadAttention``); attention maps are stored in a mutable
    ``'intermediates'`` collection (``show_attention`` parity via
    ``module.apply(..., mutable=['intermediates'])``).

    Output: ``(B, 1, E)`` for pooled methods or ``(B, L, E)`` for ``none``.
    """

    field_size: int
    embed_size: int
    fields: Tuple[str, ...]
    padding_idx: int = 0
    use_attn: bool = False
    num_heads: int = 1
    dropout_rate: float = 0.0
    output_method: str = "avg_pooling"
    lengths_field: Optional[str] = None

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False) -> jnp.ndarray:
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=0.01),
            (self.field_size, self.embed_size),
        )
        ids = batch[self.fields[0]]  # (B, L)
        if ids.ndim == 1:
            ids = ids[:, None]
        emb = maybe_sharded_lookup(table, ids)  # (B, L, E)

        mask = None
        if self.lengths_field is not None and self.lengths_field in batch:
            mask = _length_mask(batch[self.lengths_field], ids.shape[1])
        elif self.padding_idx is not None:
            mask = ids != self.padding_idx

        if self.use_attn:
            attn_mask = None
            if mask is not None:
                # (B, 1, L, L): a query may attend to any valid key
                attn_mask = mask[:, None, None, :] & jnp.ones(
                    (1, 1, ids.shape[1], 1), dtype=bool
                )
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                qkv_features=self.embed_size,
                dropout_rate=self.dropout_rate,
                deterministic=not training,
            )
            emb = attn(emb, emb, mask=attn_mask, sow_weights=True)
        return _aggregate(emb, mask, self.output_method)


class SequenceIndicesEmbedding(BaseInput):
    """Ordered id sequence → embed → RNN (LSTM / GRU / vanilla) → pooled.

    Reference: ``sequence_indices_emb.py:11-171``; the schema's companion
    ``lengths`` field (``set_schema:100``) is the ``lengths_field`` here.
    Bidirectional doubles the output embedding dim like torch's
    ``bidirectional=True`` (projected back to ``embed_size`` so downstream
    field stacking keeps a uniform E).
    """

    field_size: int
    embed_size: int
    fields: Tuple[str, ...]
    lengths_field: Optional[str] = None
    rnn_method: str = "lstm"  # 'rnn' | 'lstm' | 'gru'
    bidirectional: bool = False
    num_layers: int = 1
    output_method: str = "avg_pooling"
    padding_idx: int = 0

    def _cell(self):
        if self.rnn_method == "lstm":
            return nn.OptimizedLSTMCell(features=self.embed_size)
        if self.rnn_method == "gru":
            return nn.GRUCell(features=self.embed_size)
        if self.rnn_method == "rnn":
            return nn.SimpleCell(features=self.embed_size)
        raise ValueError(f"unknown rnn_method {self.rnn_method!r}")

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False) -> jnp.ndarray:
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=0.01),
            (self.field_size, self.embed_size),
        )
        ids = batch[self.fields[0]]  # (B, L)
        if ids.ndim == 1:
            ids = ids[:, None]
        x = maybe_sharded_lookup(table, ids)  # (B, L, E)

        if self.lengths_field is not None and self.lengths_field in batch:
            lengths = batch[self.lengths_field].astype(jnp.int32)
        else:
            lengths = jnp.sum(ids != self.padding_idx, axis=1).astype(jnp.int32)
        mask = _length_mask(lengths, ids.shape[1])

        for i in range(self.num_layers):
            if self.bidirectional:
                rnn = nn.Bidirectional(
                    nn.RNN(self._cell()), nn.RNN(self._cell()), name=f"birnn_{i}"
                )
            else:
                rnn = nn.RNN(self._cell(), name=f"rnn_{i}")
            x = rnn(x, seq_lengths=lengths)
        if self.bidirectional:
            x = nn.Dense(self.embed_size, name="bidir_proj")(x)
        return _aggregate(x, mask, self.output_method)
