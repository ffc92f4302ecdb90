"""Axial positional embeddings.

Parity targets:
* lucidrains ``axial_positional_embedding.AxialPositionalEmbedding`` as used
  for the target grid (num_targets, h, w) — summed per-axis parameter tables,
  torch param names ``weights_0..weights_{k-1}``
  (reference mmvid_pytorch/dalle_bert.py:326-327).
* ``AxialPositionalEmbeddingList`` — independent per-visual-frame axial
  embeddings with optional trailing [SEP] column that gets a zero embedding
  (reference mmvid_pytorch/modules.py:8-53).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class AxialPositionalEmbedding(nn.Module):
    """Summed axial embedding over a static shape, cropped to seq len."""
    dim: int
    axial_shape: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        """x [B, T, D] -> positional embedding [B, T, D] (broadcast over B)."""
        t = x.shape[1]
        max_len = math.prod(self.axial_shape)
        parts = []
        for ind, ax in enumerate(self.axial_shape):
            # param shape (1, *ones-except-axis, dim): identical to the
            # lucidrains torch layout so dalle.pt weights load unreshaped.
            shape = [1] + [1] * len(self.axial_shape) + [self.dim]
            shape[1 + ind] = ax
            w = self.param(f'weights_{ind}', nn.initializers.normal(1.0),
                           tuple(shape))
            parts.append(jnp.broadcast_to(
                w[0], tuple(self.axial_shape) + (self.dim,)))
        emb = sum(parts).reshape(max_len, self.dim)
        return jnp.broadcast_to(emb[None, :t, :], (x.shape[0], t, self.dim))


class AxialPositionalEmbeddingList(nn.Module):
    """Per-visual-frame axial embeddings (modules.py:8-53).

    Input [B, num*chunk(+num if SEP), D]; each frame chunk gets its own
    AxialPositionalEmbedding; an inserted [SEP] column receives zeros.
    """
    dim: int
    num: int
    axial_shape: Tuple[int, ...]

    @nn.compact
    def __call__(self, emb):
        chunk = math.prod(self.axial_shape)
        seq_len = self.num * chunk
        has_sep = emb.shape[1] > seq_len
        chunks = jnp.split(emb, self.num, axis=1)
        outs = []
        for i, c in enumerate(chunks):
            mod = AxialPositionalEmbedding(self.dim, self.axial_shape,
                                           name=f'module_list_{i}')
            if has_sep:
                pos = mod(c[:, :-1])
                pos = jnp.concatenate(
                    [pos, jnp.zeros((emb.shape[0], 1, self.dim),
                                    dtype=pos.dtype)], axis=1)
            else:
                pos = mod(c)
            outs.append(pos)
        return jnp.concatenate(outs, axis=1)
