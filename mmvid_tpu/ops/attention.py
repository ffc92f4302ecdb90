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


def _make_packed_kernel(d: int, hpb: int, bf16_av: bool,
                        int8_qk: bool = False):
    """Kernel over a [L, hpb*d] block: hpb heads packed side by side so the
    block's lane width is a 128 multiple while the array keeps the
    residual-stream [B, L, H*D] layout.

    int8_qk (MMVID_ATTN_INT8=1, serving-only): both matmuls run on the
    int8 MXU path (2x bf16 rate on v5e).  Quantization is per-program
    dynamic — the abs-max reduces stay in VMEM, so unlike the XLA-level
    serving path (ops/int8.py) no HBM round trip is added; probabilities
    quantize with the fixed scale 127 (they live in [0, 1])."""

    def kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
        for i in range(hpb):
            sl = slice(i * d, (i + 1) * d)
            # QK^T feeds the MXU in the INPUT dtype: the operands are
            # bf16-valued, so bf16 multiplies with the fp32 accumulation
            # preferred_element_type requests are exact — same numbers as
            # the old upcast-then-dot at the native-bf16 MXU rate.
            q = q_ref[0, :, sl]                        # [L, D]
            k = k_ref[0, :, sl]
            if int8_qk:
                qf = q.astype(jnp.float32)
                kf = k.astype(jnp.float32)
                qs = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-8) / 127.0
                ks = jnp.maximum(jnp.max(jnp.abs(kf)), 1e-8) / 127.0
                q8 = jnp.round(qf / qs).astype(jnp.int8)
                k8 = jnp.round(kf / ks).astype(jnp.int8)
                logits = jax.lax.dot_general(
                    q8, k8, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32
                ).astype(jnp.float32) * (qs * ks)
            else:
                logits = jax.lax.dot_general(
                    q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)    # [L, L]
            logits = logits + mask_ref[:]
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            if int8_qk:
                vf = v_ref[0, :, sl].astype(jnp.float32)
                vs = jnp.maximum(jnp.max(jnp.abs(vf)), 1e-8) / 127.0
                v8 = jnp.round(vf / vs).astype(jnp.int8)
                p8 = jnp.round(p * 127.0).astype(jnp.int8)
                out = (jnp.dot(p8, v8, preferred_element_type=jnp.int32
                               ).astype(jnp.float32)
                       * (vs / 127.0)) / denom
            elif bf16_av:
                # MMVID_ATTN_BF16=1: probabilities rounded to bf16 for a
                # native-rate AV matmul (~1e-3 relative output change;
                # bench-only, parity tests run without it)
                out = jnp.dot(p.astype(jnp.bfloat16), v_ref[0, :, sl],
                              preferred_element_type=jnp.float32) / denom
            else:
                v = v_ref[0, :, sl].astype(jnp.float32)
                out = jnp.dot(p, v,
                              preferred_element_type=jnp.float32) / denom
            o_ref[0, :, sl] = out.astype(o_ref.dtype)

    return kernel


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _attention_xla(q, k, v, mask, scale):
    """Differentiable XLA attention with the kernel's exact semantics
    (fp32 logits/softmax, [B,L,H,D] layout) — the custom_vjp backward
    recomputes through this, flash-attention style."""
    logits = jnp.einsum('blhd,bmhd->bhlm', q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    logits = logits + mask[None, None]
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum('bhlm,bmhd->blhd', p, v.astype(jnp.float32))
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _fused_attention(q, k, v, mask, scale, interpret, bf16_av, hpb_env,
                     qb_env, int8_env=False):
    return _pallas_attention(q, k, v, mask, scale, interpret, bf16_av,
                             hpb_env, qb_env, int8_env)


def _fused_attention_fwd(q, k, v, mask, scale, interpret, bf16_av, hpb_env,
                         qb_env, int8_env=False):
    return (_fused_attention(q, k, v, mask, scale, interpret, bf16_av,
                             hpb_env, qb_env, int8_env),
            (q, k, v, mask))


def _fused_attention_bwd(scale, interpret, bf16_av, hpb_env, qb_env,
                         int8_env, res, g):
    # Backward = VJP of the XLA reference, recomputing the [B,H,L,L]
    # probabilities (the kernel never materialized them).  This is what
    # makes MMVID_PALLAS_ATTN=1 usable in training, not just sampling.
    q, k, v, mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, m_: _attention_xla(q_, k_, v_, m_, scale),
        q, k, v, mask)
    return vjp(g)


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def fused_attention_blhd(q, k, v, mask, sm_scale=None, interpret=False):
    """q,k,v [B,L,H,D]; additive mask [L,L] (or None) -> [B,L,H,D].

    Layout-preserving: inputs and outputs stay in the residual stream's
    [B, L, H*D] ordering, so the surrounding reshape is free — profiling
    showed the post-attention transpose forced a strided-layout LayerNorm
    worth 26% of sampler device time.  Scaling uses the TRUE head dim.
    Differentiable: forward is the Pallas kernel, backward an XLA
    recompute (custom_vjp above).

    NOT jitted itself (callers trace it inside their own jit): the env
    flags below must be re-read at every trace — a module-level jit would
    cache the first trace and silently serve stale kernel variants to
    later in-process flag changes (bench_sweep runs variants in-process).
    """
    b, l, h, d = q.shape
    scale = sm_scale if sm_scale is not None else d ** -0.5
    if mask is None:
        mask = jnp.zeros((l, l), jnp.float32)
    bf16_av = os.environ.get('MMVID_ATTN_BF16') == '1'
    hpb_env = int(os.environ.get('MMVID_ATTN_HPB', '0'))
    qb_env = int(os.environ.get('MMVID_ATTN_QB', '0'))
    int8_env = os.environ.get('MMVID_ATTN_INT8') == '1'
    return _fused_attention(q, k, v, mask, scale, interpret, bf16_av,
                            hpb_env, qb_env, int8_env)


def _pallas_attention(q, k, v, mask, scale, interpret, bf16_av, hpb_env,
                      qb_env=0, int8_env=False):
    b, l, h, d = q.shape

    # heads packed to a 128-lane block width (2 heads at d=64);
    # hpb_env (MMVID_ATTN_HPB) overrides to amortize per-program overhead
    # over more heads (lane width stays a 128 multiple)
    hpb = max(1, 128 // d) if 128 % d == 0 else 1
    if hpb_env > 0 and h % hpb_env == 0 and (hpb_env * d) % 128 == 0:
        hpb = hpb_env
    if h % hpb != 0:
        hpb = 1
    # sublane-mult padding only (16 covers bf16); Mosaic pads lanes
    # internally.  MMVID_ATTN_QB splits the query rows into blocks of qb
    # (grid-pipelined); L then pads to a qb multiple.
    qb = qb_env if qb_env >= 16 and qb_env % 16 == 0 else 0
    lp = -(-l // (qb or 16)) * (qb or 16)

    mask_p = jnp.full((lp, lp), -1e9, jnp.float32)
    mask_p = mask_p.at[:l, :l].set(mask)

    def prep(x):
        return _pad_to(x, lp, 1).reshape(b, lp, h * d)

    qp = prep(q * scale)
    kp = prep(k)
    vp = prep(v)

    kv_spec = pl.BlockSpec((1, lp, hpb * d),
                           (lambda bi, hi, qi: (bi, 0, hi)) if qb
                           else (lambda bi, hi: (bi, 0, hi)),
                           memory_space=pltpu.VMEM)
    if qb:
        q_spec = pl.BlockSpec((1, qb, hpb * d),
                              lambda bi, hi, qi: (bi, qi, hi),
                              memory_space=pltpu.VMEM)
        mask_spec = pl.BlockSpec((qb, lp), lambda bi, hi, qi: (qi, 0),
                                 memory_space=pltpu.VMEM)
        grid = (b, h // hpb, lp // qb)
    else:
        q_spec = kv_spec
        mask_spec = pl.BlockSpec((lp, lp), lambda bi, hi: (0, 0),
                                 memory_space=pltpu.VMEM)
        grid = (b, h // hpb)
    out = pl.pallas_call(
        _make_packed_kernel(d, hpb, bf16_av, int8_env),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, mask_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, lp, h * d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, mask_p)
    return out[:, :l].reshape(b, l, h, d)


def fused_attention(q, k, v, mask, sm_scale=None, interpret=False):
    """q,k,v [B,H,L,D] -> [B,H,L,D] (compat wrapper over the layout-
    preserving kernel)."""
    out = fused_attention_blhd(q.transpose(0, 2, 1, 3),
                               k.transpose(0, 2, 1, 3),
                               v.transpose(0, 2, 1, 3), mask, sm_scale,
                               interpret=interpret)
    return out.transpose(0, 2, 1, 3)
