"""CLIP-architecture transformer backbone, TPU-native.

Parity target: mmvid_pytorch/transformers/clip_model.py.
* ResidualAttentionBlock (pre-LN, nn.MultiheadAttention, QuickGELU MLP):
  clip_model.py:201-227.
* fp32 LayerNorm islands regardless of compute dtype: clip_model.py:188-193.
* OpenAICLIPTransformer semantics: take the text (width 512) or visual
  (width 768) resblock stack of a CLIP checkpoint and rewrite every block's
  additive attention mask as ``causal`` (upper-triangular -inf) or
  ``mask_prev`` (only the estimation-token rows [ST1]/[VID] are blinded to
  all earlier keys): clip_model.py:520-584.

TPU-first notes: batch-first [B, L, D] layout throughout (the reference
permutes NLD->LND for torch's MHA; XLA prefers batch-major), one fused QKV
projection is split as q/k/v Dense layers so tensor-parallel sharding rules
(mmvid_tpu.parallel.mesh) can column/row-split them, softmax in fp32,
matmuls in the configurable compute dtype (bf16 on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9  # finite stand-in for -inf: keeps softmax NaN-free in bf16


@dataclasses.dataclass(frozen=True)
class ClipStackConfig:
    width: int = 768          # ViT-B/32 visual stack (text stack: 512)
    layers: int = 12
    heads: int = 12
    remat: bool = False       # jax.checkpoint each block (training memory)
    # --- beyond-parity parallelism (the reference is DP-only) ---
    # pipeline_stages > 1 switches the stack to the GPipe-style microbatched
    # pipeline over the 'pp' mesh axis (parallel/pipeline.py); block params
    # are then stored stacked with a leading [layers] axis sharded over pp.
    pipeline_stages: int = 1
    pipeline_microbatches: int = 2
    # seq_parallel constrains the residual stream between blocks to be
    # sequence-sharded over the 'tp' axis (Megatron-SP style): LayerNorms and
    # residual adds run on L/tp tokens per device; XLA inserts the
    # all-gather/reduce-scatter pairs around the attention/MLP matmuls.
    seq_parallel: bool = False
    # w8a8 int8 serving path (ops/int8.py): per-layer STATIC activation
    # scales (qkv_in, out_in, fc_in, proj_in), produced by
    # mmvid_tpu.ops.int8 calibration.  None = bf16/fp32 path.  Static so
    # changing scales retraces; serving-only (round() has zero gradient).
    int8_scales: Optional[tuple] = None

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


def build_attention_mask(context_length: int, mask_type: str = 'causal',
                         index: Optional[Sequence[int]] = None) -> jax.Array:
    """Additive [L, L] mask (clip_model.py:561-578).

    ``causal``: token i attends to keys <= i.
    ``mask_prev``: fully bidirectional except rows in ``index`` (the [ST1]
    and [VID] estimation tokens) cannot see keys before their own position.
    """
    if mask_type == 'causal':
        mask = jnp.triu(
            jnp.full((context_length, context_length), NEG_INF,
                     dtype=jnp.float32), k=1)
    elif mask_type == 'mask_prev':
        mask = jnp.zeros((context_length, context_length), dtype=jnp.float32)
        for i in index or ():
            mask = mask.at[i, :i].set(NEG_INF)
    else:
        raise NotImplementedError(mask_type)
    return mask


class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.nn.sigmoid(1.702 * x)


def _ln(name: str, dtype=jnp.float32):
    # fp32 LayerNorm island by default (clip_model.py:188-193); backbone
    # blocks may follow the compute dtype (profiling: the fp32
    # convert+reduce fusions are 39% of sampler time)
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=name)


class _LinearParams(nn.Module):
    """Holds a Dense layer's kernel/bias without applying it (same param
    tree as nn.Dense, for kernels that consume raw weights)."""
    features: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        return kernel, bias


class _LNParams(nn.Module):
    """Holds LayerNorm scale/bias (same tree as nn.LayerNorm)."""

    @nn.compact
    def __call__(self, dim):
        scale = self.param('scale', nn.initializers.ones, (dim,))
        bias = self.param('bias', nn.initializers.zeros, (dim,))
        return scale, bias


class FusedLnAttention(nn.Module):
    """ln_1 + QKV fused in one Pallas kernel, attention in another; the
    param tree matches _ln('ln_1') + MultiHeadAttention exactly."""
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ln_scale, ln_bias, mask=None):
        from mmvid_tpu.ops.attention import fused_attention_blhd
        from mmvid_tpu.ops.fused_ln_qkv import fused_ln_qkv

        b, l, d = x.shape
        h, hd = self.heads, self.width // self.heads
        wq, bq = _LinearParams(self.width, name='query')(x)
        wk, bk = _LinearParams(self.width, name='key')(x)
        wv, bv = _LinearParams(self.width, name='value')(x)
        dt = self.dtype
        q, k, v = fused_ln_qkv(
            x.astype(dt), ln_scale, ln_bias,
            wq.astype(dt), bq.astype(dt), wk.astype(dt), bk.astype(dt),
            wv.astype(dt), bv.astype(dt))
        out = fused_attention_blhd(
            q.reshape(b, l, h, hd), k.reshape(b, l, h, hd),
            v.reshape(b, l, h, hd),
            mask[:l, :l] if mask is not None else None)
        out = out.reshape(b, l, d).astype(dt)
        return nn.Dense(self.width, dtype=dt, name='out')(out)


class MultiHeadAttention(nn.Module):
    """Parity with torch nn.MultiheadAttention self-attention.

    MMVID_PALLAS_ATTN=1 routes the QK^T+softmax+AV through the fused
    Pallas kernel (mmvid_tpu.ops.attention) to keep logits on-chip.
    ``int8_scales`` (qkv_in, out_in) switches the four projections to the
    w8a8 int8 MXU path (ops/int8.py); param tree is unchanged."""
    width: int
    heads: int
    dtype: Any = jnp.float32
    int8_scales: Optional[tuple] = None

    def _proj(self, x, name, a_scale):
        if a_scale is None:
            return nn.Dense(self.width, dtype=self.dtype, name=name)(x)
        from mmvid_tpu.ops.int8 import quantized_dense
        kernel, bias = _LinearParams(self.width, name=name)(x)
        return quantized_dense(x, kernel, bias, a_scale)

    @nn.compact
    def __call__(self, x, mask=None):
        import os

        from mmvid_tpu.ops.int8 import CALIB_COL, calib_stats

        if self.is_mutable_collection(CALIB_COL):
            self.sow(CALIB_COL, 'qkv_in', calib_stats(x))
        sc = self.int8_scales or (None, None)
        b, l, d = x.shape
        h, hd = self.heads, self.width // self.heads
        # NB: a manually-fused [D,3D] qkv matmul was measured SLOWER (270 vs
        # 292 f/s) — the param concat re-materializes inside the sampler's
        # while_loop; three Dense calls fuse fine under XLA.
        q = self._proj(x, 'query', sc[0])
        k = self._proj(x, 'key', sc[0])
        v = self._proj(x, 'value', sc[0])
        if os.environ.get('MMVID_PALLAS_ATTN') == '1':
            # layout-preserving kernel: stays in [B, L, H, D] so no
            # transposed-layout tensor ever reaches the residual stream
            from mmvid_tpu.ops.attention import fused_attention_blhd
            out = fused_attention_blhd(
                q.reshape(b, l, h, hd), k.reshape(b, l, h, hd),
                v.reshape(b, l, h, hd),
                mask[:l, :l] if mask is not None else None)
            out = out.reshape(b, l, d).astype(self.dtype)
        else:
            q = q.reshape(b, l, h, hd).transpose(0, 2, 1, 3)
            k = k.reshape(b, l, h, hd).transpose(0, 2, 1, 3)
            v = v.reshape(b, l, h, hd).transpose(0, 2, 1, 3)
            logits = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                                preferred_element_type=jnp.float32)
            logits = logits * (hd ** -0.5)
            if mask is not None:
                logits = logits + mask[None, None, :l, :l]
            attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum('bhqk,bhkd->bhqd', attn, v,
                             preferred_element_type=jnp.float32)
            out = out.transpose(0, 2, 1, 3).reshape(b, l, d).astype(
                self.dtype)
        if self.is_mutable_collection(CALIB_COL):
            self.sow(CALIB_COL, 'out_in', calib_stats(out))
        return self._proj(out, 'out', sc[1])


class Mlp(nn.Module):
    width: int
    dtype: Any = jnp.float32
    int8_scales: Optional[tuple] = None  # (fc_in, proj_in)

    def _dense(self, x, features, name, a_scale):
        if a_scale is None:
            return nn.Dense(features, dtype=self.dtype, name=name)(x)
        from mmvid_tpu.ops.int8 import quantized_dense
        kernel, bias = _LinearParams(features, name=name)(x)
        return quantized_dense(x, kernel, bias, a_scale)

    @nn.compact
    def __call__(self, x):
        from mmvid_tpu.ops.int8 import CALIB_COL, calib_stats
        calib = self.is_mutable_collection(CALIB_COL)
        sc = self.int8_scales or (None, None)
        if calib:
            self.sow(CALIB_COL, 'fc_in', calib_stats(x))
        x = self._dense(x, 4 * self.width, 'fc', sc[0])
        x = QuickGELU()(x)
        if calib:
            self.sow(CALIB_COL, 'proj_in', calib_stats(x))
        return self._dense(x, self.width, 'proj', sc[1])


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32
    int8_scales: Optional[tuple] = None  # (qkv_in, out_in, fc_in, proj_in)

    @nn.compact
    def __call__(self, x, mask=None):
        import os

        from mmvid_tpu.ops.int8 import CALIB_COL
        sc = self.int8_scales
        if (os.environ.get('MMVID_FUSED_LNQKV') == '1'
                and self.width % 128 == 0 and sc is None
                # calibration must go through MultiHeadAttention/Mlp so
                # their qkv_in/out_in abs-max records get sowed
                and not self.is_mutable_collection(CALIB_COL)):
            # ln_1 statistics computed inside the QKV kernel; param tree
            # identical to the unfused path
            ln_scale, ln_bias = _LNParams(name='ln_1')(self.width)
            x = x + FusedLnAttention(self.width, self.heads,
                                     dtype=self.dtype,
                                     name='attn')(x, ln_scale, ln_bias,
                                                  mask)
        else:
            ln_dtype = (self.dtype
                        if os.environ.get('MMVID_FAST_LN') == '1'
                        else jnp.float32)
            h = _ln('ln_1', ln_dtype)(x).astype(self.dtype)
            x = x + MultiHeadAttention(
                self.width, self.heads, dtype=self.dtype,
                int8_scales=sc[:2] if sc else None, name='attn')(h, mask)
        h = _ln('ln_2')(x).astype(self.dtype)
        x = x + Mlp(self.width, dtype=self.dtype,
                    int8_scales=sc[2:] if sc else None, name='mlp')(h)
        return x


class TransformerStack(nn.Module):
    """The resblock stack used as the MMVID backbone.

    The additive mask is a static [L, L] array applied at every block, as in
    the reference (every resblock gets the same rewritten attn_mask,
    clip_model.py:545-554).  ``remat=True`` rematerializes each block's
    activations on the backward pass (jax.checkpoint), trading FLOPs for
    HBM in the 3-forward training step.
    """
    cfg: ClipStackConfig
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        if self.cfg.pipeline_stages > 1:
            return self._pipelined(x, mask)
        from mmvid_tpu.parallel.pipeline import maybe_constrain
        x = x.astype(self.dtype)
        sp = self.cfg.seq_parallel
        if sp:
            x = maybe_constrain(x, 'dp', 'tp', None)
        block_cls = (nn.remat(ResidualAttentionBlock,
                              static_argnums=())
                     if (self.remat or self.cfg.remat)
                     else ResidualAttentionBlock)
        i8 = self.cfg.int8_scales
        assert i8 is None or not (self.remat or self.cfg.remat), (
            'int8 path is serving-only (round() has zero gradient); '
            'disable remat/int8_scales')
        for i in range(self.cfg.layers):
            x = block_cls(self.cfg.width, self.cfg.heads,
                          dtype=self.dtype,
                          int8_scales=i8[i] if i8 else None,
                          name=f'blocks_{i}')(x, mask)
            if sp:
                x = maybe_constrain(x, 'dp', 'tp', None)
        return x.astype(jnp.float32)

    def _pipelined(self, x, mask):
        """GPipe-style microbatched pipeline over the 'pp' mesh axis.

        Block params live in ONE 'blocks' pytree param with a leading
        [layers] axis (pp-sharded; see parallel/mesh.py rules).  Every
        schedule tick applies all S stages in parallel — a vmap over the
        pp-sharded stage axis, so each device runs exactly its own stage —
        and the inter-stage hand-off is a shift along that axis, which XLA
        lowers to a collective-permute over ICI.  Wall-clock per call is
        (M + S - 1) stage-times; the (S-1)/(M+S-1) bubble is the standard
        GPipe cost.  Numerics match the sequential stack (same per-block
        math, same order; up to XLA tiling reassociation ~1e-6)."""
        from mmvid_tpu.parallel.pipeline import maybe_constrain
        cfg = self.cfg
        assert cfg.int8_scales is None, (
            'int8 serving path not supported with pipeline_stages > 1 '
            '(per-layer static scales cannot vary inside the stage scan)')
        S, M = cfg.pipeline_stages, cfg.pipeline_microbatches
        assert cfg.layers % S == 0, (
            f'{cfg.layers} layers not divisible by {S} pipeline stages')
        x = x.astype(self.dtype)
        b, l, d = x.shape
        while b % M:
            M -= 1  # clamp to a divisor (init traces with batch 1)
        mbs = b // M

        # Detached block template: init/apply as pure functions so the
        # stacked param tree has exactly the per-block structure.
        blk = ResidualAttentionBlock(cfg.width, cfg.heads, dtype=self.dtype,
                                     parent=None)

        def init_fn(rng):
            dummy = jnp.zeros((1, 8, cfg.width), self.dtype)
            keys = jax.random.split(rng, cfg.layers)
            return jax.vmap(
                lambda k: blk.init(k, dummy, None)['params'])(keys)

        stacked = self.param('blocks', init_fn)

        p_s = jax.tree_util.tree_map(
            lambda a: a.reshape((S, cfg.layers // S) + a.shape[1:]), stacked)

        def block_apply(p, c):
            return blk.apply({'params': p}, c, mask)

        if cfg.remat:  # same FLOPs-for-HBM trade as the sequential path
            block_apply = jax.checkpoint(block_apply)

        def stage_fn(p_stage, h):
            def body(c, p):
                return block_apply(p, c), None
            h, _ = jax.lax.scan(body, h, p_stage)
            return h

        x_mb = x.reshape(M, mbs, l, d)
        state = jnp.zeros((S, mbs, l, d), x.dtype).at[0].set(x_mb[0])
        outputs = jnp.zeros((M, mbs, l, d), x.dtype)
        # with seq_parallel the inter-stage buffer is additionally
        # sequence-sharded over tp (the hand-off rides pp, LN/residual work
        # is split over tp)
        state_spec = (('pp', 'dp', 'tp') if cfg.seq_parallel
                      else ('pp', 'dp'))
        for t in range(M + S - 1):
            state = maybe_constrain(state, *state_spec)
            y = jax.vmap(stage_fn)(p_s, state)
            if t >= S - 1:
                outputs = outputs.at[t - (S - 1)].set(y[-1])
            nxt = (x_mb[t + 1] if t + 1 < M
                   else jnp.zeros((mbs, l, d), x.dtype))
            # shift stages: stage i receives stage i-1's output
            state = jnp.concatenate([nxt[None], y[:-1]], axis=0)
        return outputs.reshape(b, l, d).astype(jnp.float32)


def load_openai_clip_stack(model_path: str,
                           which_model: str = 'openai_clip_visual'):
    """Load ViT-B-32.pt (torch.jit archive) and return
    (ClipStackConfig, flax params) for the requested stack
    (clip_model.py:535-543)."""
    from mmvid_tpu.utils.torch_compat import (
        clip_stack_dims, convert_clip_resblocks, load_torchjit_state_dict)
    sd = load_torchjit_state_dict(model_path)
    prefix = ('visual.transformer' if which_model == 'openai_clip_visual'
              else 'transformer')
    width, layers, heads = clip_stack_dims(sd, prefix)
    params = convert_clip_resblocks(sd, prefix)
    return ClipStackConfig(width=width, layers=layers, heads=heads), params
