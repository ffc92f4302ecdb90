"""Fused self-attention Pallas kernel for the MMVID backbone.

The backbone attends over ~565 tokens (1+50+2+512 sequence, SURVEY §2.2).
Unfused XLA attention materializes [B, H, L, L] logits in HBM
(B16 x H12 x 565^2 fp32 ≈ 2.4 GB of traffic per forward); at this L the
whole per-(batch, head) problem fits VMEM, so one kernel program computes
QK^T + mask + softmax + AV entirely on-chip — flash-attention's effect
without the online-softmax machinery it needs at long L.

Layout notes: head_dim 64 is padded to 128 lanes, L padded to a sublane
multiple; the additive mask handles key padding (-1e9).  Used by
mmvid_tpu.models.clip.MultiHeadAttention when MMVID_PALLAS_ATTN=1.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    q = q_ref[0].astype(jnp.float32)          # [L, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)    # [L, L]
    logits = logits + mask_ref[:]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
    o_ref[0] = out.astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=('interpret',))
def fused_attention(q, k, v, mask, sm_scale=None, interpret=False):
    """q,k,v [B,H,L,D]; additive mask [L,L] (or None) -> [B,H,L,D] fp32.

    Scaling uses D**-0.5 of the TRUE head dim (before lane padding)."""
    b, h, l, d = q.shape
    scale = sm_scale if sm_scale is not None else d ** -0.5

    # sublane-mult padding only (16 covers bf16); Mosaic handles interior
    # lane padding of the [lp, lp] mask — profiling showed full 128-mult
    # padding (565->640) cost ~16% of sampler time in HBM pad/copy traffic
    lp = -(-l // 16) * 16
    dp = max(d, 128) if os.environ.get('MMVID_ATTN_PAD_D', '1') == '1' \
        else d

    if mask is None:
        mask = jnp.zeros((l, l), jnp.float32)
    mask_p = jnp.full((lp, lp), -1e9, jnp.float32)
    mask_p = mask_p.at[:l, :l].set(mask)

    def prep(x):
        x = _pad_to(_pad_to(x, lp, 2), dp, 3)
        return x.reshape(b * h, lp, dp)

    qp = prep(q * scale)
    kp = prep(k)
    vp = prep(v)

    out = pl.pallas_call(
        _attn_kernel,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, lp, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lp, lp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lp, dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lp, dp), jnp.float32),
        interpret=interpret,
    )(qp, kp, vp, mask_p)
    return out.reshape(b, h, lp, dp)[:, :, :l, :d]
