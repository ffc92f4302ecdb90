"""ART-V: the autoregressive baseline model, with a KV-cached sampler.

Parity target: mmvid_pytorch/dalle_artv.py:103-542 (class DALLE).

Sequence: <bos>+text (text_seq_len+1) | visual (num_visuals*n) | target
(num_targets*n), causal transformer, disjoint vocab ranges
  [0, num_text_tokens) text (incl. per-position padding ids)
  [num_text_tokens, +num_visual_tokens) visual (incl. per-position pads)
  [num_control_tokens, +num_image_tokens) image
with a block-diagonal logits mask so each segment predicts its own range
(dalle_artv.py:216-227), CE loss weighted (1, loss_vis=1, loss_img=7)/9
(dalle_artv.py:526-539).

TPU-first: the reference samples 512 tokens with a FULL O(L^2) forward per
token and re-tokenizes the visual control every step (dalle_artv.py:258-281,
SURVEY.md §3.3).  Here generation is one `lax.scan` over positions with a
KV cache: the control prefix is encoded once, each step is O(L) attention
against the cache, and only image-range logits are materialized.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mmvid_tpu.models.axial import (
    AxialPositionalEmbedding,
    AxialPositionalEmbeddingList,
)
from mmvid_tpu.models.clip import (
    ClipStackConfig,
    TransformerStack,
    build_attention_mask,
)

_EMB_INIT = nn.initializers.normal(1.0)


@dataclasses.dataclass(frozen=True)
class ArtvConfig:
    dim: int = 768
    num_text_tokens: int = 10000      # raw; padding ids appended
    text_seq_len: int = 50
    num_visuals: int = 1
    num_targets: int = 8
    num_image_tokens: int = 1024
    image_fmap_size: int = 8
    image_size: int = 128
    loss_img_weight: float = 7.0
    loss_vis_weight: float = 1.0
    stable: bool = False
    clip: ClipStackConfig = ClipStackConfig()

    @property
    def image_seq_len(self) -> int:
        return self.image_fmap_size ** 2

    @property
    def visual_seq_len(self) -> int:
        return self.num_visuals * self.image_seq_len

    @property
    def target_seq_len(self) -> int:
        return self.num_targets * self.image_seq_len

    @property
    def effective_num_text_tokens(self) -> int:
        return self.num_text_tokens + self.text_seq_len

    @property
    def num_visual_tokens(self) -> int:
        return self.num_image_tokens + self.visual_seq_len

    @property
    def num_control_tokens(self) -> int:
        return self.effective_num_text_tokens + self.num_visual_tokens

    @property
    def total_tokens(self) -> int:
        return self.num_control_tokens + self.num_image_tokens

    @property
    def control_seq_len(self) -> int:
        return self.text_seq_len + self.visual_seq_len

    @property
    def total_seq_len(self) -> int:
        # <bos>+text contributes text_seq_len+1 embeddings, but the last
        # target token is dropped at train time (dalle_artv.py:494-498), so
        # the transformer always sees exactly this many positions:
        return self.text_seq_len + self.visual_seq_len + self.target_seq_len


class ArtvCore(nn.Module):
    """Parameters + full-sequence training forward."""
    cfg: ArtvConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.text_emb = nn.Embed(cfg.effective_num_text_tokens, cfg.dim,
                                 embedding_init=_EMB_INIT)
        self.image_emb = nn.Embed(cfg.num_image_tokens, cfg.dim,
                                  embedding_init=_EMB_INIT)
        self.text_pos_emb = nn.Embed(cfg.text_seq_len + 1, cfg.dim,
                                     embedding_init=_EMB_INIT)  # +1 <bos>
        if cfg.num_targets == 1:
            self.image_pos_emb = AxialPositionalEmbedding(
                cfg.dim, (cfg.image_fmap_size, cfg.image_fmap_size))
        else:
            self.image_pos_emb = AxialPositionalEmbedding(
                cfg.dim, (cfg.num_targets, cfg.image_fmap_size,
                          cfg.image_fmap_size))
        if cfg.num_visuals > 0:
            self.visual_emb = nn.Embed(cfg.num_visual_tokens, cfg.dim,
                                       embedding_init=_EMB_INIT)
            self.visual_pos_emb = AxialPositionalEmbeddingList(
                cfg.dim, cfg.num_visuals,
                (cfg.image_fmap_size, cfg.image_fmap_size))
        self.special_emb = nn.Embed(4, cfg.dim, embedding_init=_EMB_INIT)
        self.estimation_pos_emb = nn.Embed(2, cfg.dim,
                                           embedding_init=_EMB_INIT)
        self.transformer = TransformerStack(cfg.clip, dtype=self.dtype)
        self.to_logits_ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.to_logits_fc = nn.Dense(cfg.total_tokens, dtype=self.dtype)

    # -- embedding assembly ------------------------------------------------
    def control_tokens_embedding(self, text, visual_tokens):
        """<bos>+text+visual embeddings [B, 1+text+visual, D].

        text [B, text_seq_len] raw ids (0 = padding); visual_tokens
        [B, visual_seq_len] image-codebook ids or -1 for absent
        (dalle_artv.py:437-477).
        """
        cfg = self.cfg
        b = text.shape[0]
        text_range = (jnp.arange(cfg.text_seq_len)
                      + (cfg.effective_num_text_tokens - cfg.text_seq_len))
        text = jnp.where(text == 0, text_range[None], text)
        text = jnp.concatenate(
            [jnp.zeros((b, 1), text.dtype), text], axis=1)  # <bos>=0
        t_emb = self.text_emb(text) + self.text_pos_emb(
            jnp.arange(cfg.text_seq_len + 1))[None]
        parts = [t_emb]
        if cfg.num_visuals > 0:
            if visual_tokens is None:
                visual_tokens = jnp.full((b, cfg.visual_seq_len), -1,
                                         jnp.int32)
            visual_range = (jnp.arange(cfg.visual_seq_len)
                            + (cfg.num_visual_tokens - cfg.visual_seq_len))
            visual_tokens = jnp.where(visual_tokens == -1,
                                      visual_range[None], visual_tokens)
            v_emb = self.visual_emb(visual_tokens)
            v_emb = v_emb + self.visual_pos_emb(v_emb)
            parts.append(v_emb)
        return jnp.concatenate([p.astype(jnp.float32) for p in parts],
                               axis=1)

    def target_embedding(self, image_tokens):
        emb = self.image_emb(image_tokens)
        full = self.image_pos_emb(
            jnp.zeros((emb.shape[0], self.cfg.target_seq_len, self.cfg.dim)))
        return emb + full[:, :emb.shape[1]]

    def to_logits(self, h):
        return self.to_logits_fc(
            self.to_logits_ln(h).astype(self.dtype)).astype(jnp.float32)

    def __call__(self, text, visual_tokens, image_tokens):
        """Training forward -> logits [B, total_seq_len, total_tokens]
        (causal; last target position dropped, dalle_artv.py:494-500)."""
        cfg = self.cfg
        ctrl = self.control_tokens_embedding(text, visual_tokens)
        tgt = self.target_embedding(image_tokens)
        tokens = jnp.concatenate([ctrl, tgt], axis=1)[:, :-1]
        mask = build_attention_mask(cfg.total_seq_len, 'causal')
        out = self.transformer(tokens, mask)
        if cfg.stable:
            out = out / jnp.max(out, axis=-1, keepdims=True)
        return self.to_logits(out)


def logits_block_mask(cfg: ArtvConfig) -> np.ndarray:
    """[total_seq_len, total_tokens] bool, True = FORBIDDEN
    (dalle_artv.py:216-227)."""
    m = np.ones((cfg.total_seq_len, cfg.total_tokens), bool)
    t, v = cfg.text_seq_len, cfg.visual_seq_len
    m[:t, :cfg.effective_num_text_tokens] = False
    m[t:t + v, cfg.effective_num_text_tokens:cfg.num_control_tokens] = False
    m[t + v:, cfg.num_control_tokens:] = False
    return m


def artv_loss(core: ArtvCore, params, text, visual_tokens, image_tokens):
    """(loss, 0, 0) — weighted segment CE (dalle_artv.py:503-542)."""
    cfg = core.cfg
    logits = core.apply({'params': params}, text, visual_tokens,
                        image_tokens)
    mask = jnp.asarray(logits_block_mask(cfg))
    logits = jnp.where(mask[None], -jnp.inf, logits)

    # labels: text (without bos) | visual + text offset | image + ctrl offset
    text_range = (jnp.arange(cfg.text_seq_len)
                  + (cfg.effective_num_text_tokens - cfg.text_seq_len))
    text_ids = jnp.where(text == 0, text_range[None], text)
    labels = [text_ids]
    if cfg.num_visuals > 0:
        visual_range = (jnp.arange(cfg.visual_seq_len)
                        + (cfg.num_visual_tokens - cfg.visual_seq_len))
        vis_ids = jnp.where(visual_tokens == -1, visual_range[None],
                            visual_tokens)
        labels.append(vis_ids + cfg.effective_num_text_tokens)
    labels.append(image_tokens + cfg.num_control_tokens)
    labels = jnp.concatenate(labels, axis=1)

    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]

    t, c = cfg.text_seq_len, cfg.control_seq_len
    loss_text = jnp.mean(nll[:, :t])
    loss_vis = jnp.mean(nll[:, t:c]) if cfg.num_visuals > 0 else 0.0
    loss_img = jnp.mean(nll[:, c:])
    denom = cfg.loss_img_weight + cfg.loss_vis_weight + 1.0
    loss = (loss_text + cfg.loss_vis_weight * loss_vis
            + cfg.loss_img_weight * loss_img) / denom
    return loss, jnp.float32(0.0), jnp.float32(0.0)


class ArtvModel:
    """Top-level ART-V wrapper mirroring MMVIDBert's API surface
    (loss(params, key, ...), generate_images) so the training driver and
    step builder are model-agnostic (reference DALLE class surface,
    dalle_artv.py:103-304)."""

    def __init__(self, cfg: ArtvConfig, vae, cvae=None, params=None,
                 key=None, dtype=jnp.float32):
        self.cfg = cfg
        self.vae = vae
        self.cvae = cvae
        self.core = ArtvCore(cfg, dtype=dtype)
        if params is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            params = self.init_params(key)
        self.params = params
        self._gen_cache = {}

    def init_params(self, key):
        cfg = self.cfg
        return self.core.init(
            key, jnp.zeros((1, cfg.text_seq_len), jnp.int32),
            jnp.zeros((1, cfg.visual_seq_len), jnp.int32),
            jnp.zeros((1, cfg.target_seq_len), jnp.int32))['params']

    def get_image_tokens(self, images, which_vae='vae'):
        vae = self.cvae if (which_vae == 'cvae' and self.cvae is not None) \
            else self.vae
        if images.ndim == 4:
            images = images[:, None]
        b, t = images.shape[:2]
        flat = images.reshape((b * t,) + images.shape[2:])
        return vae.get_codebook_indices(flat).reshape(b, -1)

    def loss(self, params, key, *, text, visual=None, target=None,
             **unused):
        """(loss, 0, 0) — the driver's beta_msm scales it; beta_msm is
        forced to 1.0 in AR mode (utils_args.py:529-533)."""
        if visual is not None and visual.ndim >= 4:
            visual_tokens = self.get_image_tokens(visual, which_vae='cvae')
        elif visual is not None:
            visual_tokens = visual
        else:
            visual_tokens = jnp.full(
                (text.shape[0], self.cfg.visual_seq_len), -1, jnp.int32)
        if target.ndim >= 4:
            target_tokens = self.get_image_tokens(target)
        else:
            target_tokens = target
        return artv_loss(self.core, params, text, visual_tokens,
                         target_tokens)

    def generate_images(self, key, text, *, visual=None, filter_thres=0.5,
                        temperature=1.0, decode=True, int8=False,
                        spec_stats=False, **unused):
        """spec_stats=True appends a per-lane chunk-step count [B] to the
        returns: (videos, seq, steps).  With MMVID_ARTV_SPEC=k on,
        (target_seq_len-1)/steps is the realised tokens-per-chunk-forward
        (the speculation gain); on the baseline path steps is exactly
        target_seq_len-1."""
        import os as _os
        # the decode-path env flags are read at TRACE time inside
        # ar_sample, so they must key the trace cache too — otherwise
        # toggling one on a live model silently reuses the stale trace
        # (the stale-trace hazard CLAUDE.md calls out)
        env_flags = tuple(
            _os.environ.get(k, '') for k in
            ('MMVID_ARTV_WINDOW', 'MMVID_ARTV_FUSED', 'MMVID_ARTV_FLAT',
             'MMVID_ARTV_INT8_WEIGHTS_ONLY', 'MMVID_ARTV_SPEC',
             'MMVID_ARTV_SPEC_FORCE', 'MMVID_SPEC_SCATTER',
             'MMVID_SPEC_WINDOW', 'MMVID_ARTV_SPLIT'))
        statics = (visual is not None,
                   visual.ndim if visual is not None else 0,
                   filter_thres, temperature, decode, int8, spec_stats,
                   env_flags)
        if statics not in self._gen_cache:
            def impl(params, vae_params, text, visual, key):
                if visual is not None and visual.ndim >= 4:
                    vtok = self.get_image_tokens(visual, which_vae='cvae')
                elif visual is not None:
                    vtok = visual
                else:
                    vtok = jnp.full(
                        (text.shape[0], self.cfg.visual_seq_len), -1,
                        jnp.int32)
                seq, steps = ar_sample(self.core, params, text, vtok, key,
                                       filter_thres=filter_thres,
                                       temperature=temperature, int8=int8,
                                       return_steps=True)
                if not decode:
                    return (None, seq, steps) if spec_stats else (None, seq)
                b = seq.shape[0]
                frames = seq.reshape(b * self.cfg.num_targets,
                                     self.cfg.image_seq_len)
                imgs = self.vae._decode_impl(vae_params, frames)
                vids = imgs.reshape((b, self.cfg.num_targets)
                                    + imgs.shape[1:])
                return (vids, seq, steps) if spec_stats else (vids, seq)
            self._gen_cache[statics] = jax.jit(impl)
        return self._gen_cache[statics](self.params, self.vae.params, text,
                                        visual, key)

    def decode_video(self, img_seq):
        b = img_seq.shape[0]
        frames = img_seq.reshape(b * self.cfg.num_targets,
                                 self.cfg.image_seq_len)
        imgs = self.vae.decode(frames)
        return imgs.reshape((b, self.cfg.num_targets) + imgs.shape[1:])

    def recon_images(self, images, which_vae='vae'):
        """Tokenize + decode round-trip for any frame count (visual
        controls have num_visuals frames, not num_targets)."""
        toks = self.get_image_tokens(images, which_vae)
        vae = self.cvae if (which_vae == 'cvae' and self.cvae is not None) \
            else self.vae
        b = toks.shape[0]
        t = toks.shape[1] // self.cfg.image_seq_len
        imgs = vae.decode(toks.reshape(b * t, self.cfg.image_seq_len))
        return imgs.reshape((b, t) + imgs.shape[1:])


# ---------------------------------------------------------------------------
# KV-cached autoregressive sampling
# ---------------------------------------------------------------------------

def _block_params(params, i):
    return params['transformer'][f'blocks_{i}']


def _ln(p, x):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p['scale'] + p['bias']


def ar_sample(core: ArtvCore, params, text, visual_tokens, key,
              filter_thres: float = 0.5, temperature: float = 1.0,
              int8: bool = False, return_steps: bool = False):
    """KV-cached sampling of all target tokens.

    1. Encode the control prefix (<bos>+text+visual) once through the stack,
       caching every layer's K/V.
    2. `lax.scan` over target positions: one-token forward against the cache.
    Returns image tokens [B, target_seq_len] in [0, num_image_tokens).

    Decode-bandwidth design (profiled at flagship size, ROADMAP.md): the
    per-token step is weight/cache-streaming bound, so (a) block weights
    and the K/V caches run in the model's compute dtype (bf16 halves HBM
    traffic; LayerNorms, softmax, and accumulations stay fp32), and (b)
    the output head is sliced ONCE to the image-token columns before the
    scan — the reference computes all ~51k vocab logits per step and
    discards everything but the 1024 image columns (dalle_artv.py:263-276),
    ~80 MB of dead weight traffic per token at flagship size.

    int8=True (serving opt-in, beyond-parity): halves the streamed bytes
    again — block weights are quantized to int8 with per-output-channel
    scales (computed in-trace before the scan; params untouched) and the
    stacked K/V caches are stored int8 with per-(layer, head) scales
    calibrated from the prefill range (x1.5 headroom; later tokens
    saturate-clip).  Activations quantize dynamically per step — a [B, D]
    abs-max is VPU noise at decode shapes, unlike the serving backbone
    where in-loop reduces cost the MXU gain (ops/int8.py docstring).
    """
    import os as _os

    # Exact speculative multi-token decode (MMVID_ARTV_SPEC=k, trace-time
    # opt-in): copy-previous-frame drafts verified by rejection sampling —
    # identical output distribution, up to k+1 tokens per chunk forward
    # (models/artv_spec.py).  bf16 path only.
    spec_k = int(_os.environ.get('MMVID_ARTV_SPEC', '0') or 0)
    if spec_k > 0 and not int8:
        from mmvid_tpu.models.artv_spec import ar_sample_spec
        toks, steps = ar_sample_spec(core, params, text, visual_tokens,
                                     key, spec_k=spec_k,
                                     filter_thres=filter_thres,
                                     temperature=temperature)
        # steps [B] = chunk-forward count per lane; (target_seq_len-1)
        # committed loop tokens / steps is the realised speculation gain
        return (toks, steps) if return_steps else toks

    cfg = core.cfg
    clip_cfg = cfg.clip
    heads, hd = clip_cfg.heads, clip_cfg.width // clip_cfg.heads
    n_layers = clip_cfg.layers
    b = text.shape[0]
    L = cfg.total_seq_len  # max positions seen by the transformer
    ctrl_len = cfg.control_seq_len + 1  # +bos
    dt = core.dtype

    ctrl_emb = core.apply({'params': params}, text, visual_tokens,
                          method=ArtvCore.control_tokens_embedding)
    pos_emb_full = core.apply(
        {'params': params},
        jnp.zeros((b, cfg.target_seq_len, cfg.dim)),
        method=lambda m, x: m.image_pos_emb(x))
    # jnp.asarray: params may arrive as host numpy (checkpoint/oracle
    # converters) and numpy tables cannot be gathered with a traced token
    image_emb_table = jnp.asarray(params['image_emb']['embedding'])

    def cast_block(p):
        # weights in the compute dtype (cast once, outside the scan); LN
        # params and biases stay fp32 (fp32 islands, negligible traffic)
        def c(sub):
            return {'kernel': sub['kernel'].astype(dt), 'bias': sub['bias']}
        return {'ln_1': p['ln_1'], 'ln_2': p['ln_2'],
                'attn': {k: c(v) for k, v in p['attn'].items()},
                'mlp': {k: c(v) for k, v in p['mlp'].items()}}

    blocks = [cast_block(_block_params(params, i)) for i in range(n_layers)]

    def fuse_qkv(sub):
        """q/k/v projections concatenated into ONE [D, 3D] matmul for the
        decode step — 3 latency-bound [B,D]x[D,D] reads become one bigger
        streamed read (column-wise concat, bitwise-identical results)."""
        return {'kernel': jnp.concatenate(
                    [sub['query']['kernel'], sub['key']['kernel'],
                     sub['value']['kernel']], axis=1),
                'bias': jnp.concatenate(
                    [sub['query']['bias'], sub['key']['bias'],
                     sub['value']['bias']])}

    dec_blocks = [{'ln_1': p['ln_1'], 'ln_2': p['ln_2'],
                   'attn': {'qkv': fuse_qkv(p['attn']),
                            'out': p['attn']['out']},
                   'mlp': p['mlp']} for p in blocks] if not int8 else None

    def dot(x, sub):
        return jnp.dot(x.astype(dt), sub['kernel'],
                       preferred_element_type=jnp.float32) + sub['bias']

    # ---- int8 decode machinery (serving opt-in) ----
    def quant_weight(sub):
        """kernel -> (int8 weights, per-output-channel scales); computed
        in-trace BEFORE the scan, so the fp32 kernel streams once."""
        kern = sub['kernel'].astype(jnp.float32)
        w_s = jnp.maximum(jnp.max(jnp.abs(kern), axis=0), 1e-8) / 127.0
        w_q = jnp.round(kern / w_s[None, :]).astype(jnp.int8)
        return {'w_q': w_q, 'w_s': w_s, 'bias': sub['bias']}

    def quant_block(p):
        # fused q/k/v via the same fuse_qkv as the bf16 path (one concat
        # layout definition) — per-output-channel scales make the
        # concatenated quantization bitwise-equal to three separate ones
        return {'ln_1': p['ln_1'], 'ln_2': p['ln_2'],
                'attn': {'qkv': quant_weight(fuse_qkv(p['attn'])),
                         'out': quant_weight(p['attn']['out'])},
                'mlp': {k: quant_weight(v) for k, v in p['mlp'].items()}}

    def dot8(x, sub):
        """int8 matmul with a dynamic per-step activation scale: at [B, D]
        decode shapes the abs-max is VPU noise, and the int8 weight read
        halves the streamed bytes (the decode wall)."""
        a_s = jnp.maximum(jnp.max(jnp.abs(x)), 1e-6) / 127.0
        x_q = jnp.round(x.astype(jnp.float32) / a_s).astype(jnp.int8)
        acc = jnp.dot(x_q, sub['w_q'], preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (a_s * sub['w_s']) + sub['bias']

    blocks8 = [quant_block(_block_params(params, i))
               for i in range(n_layers)] if int8 else None
    # experiment switch (HW sweeps, ROADMAP): quantize the weights but
    # keep the K/V caches bf16 — isolates which stream the int8 win or
    # loss comes from
    import os as _os
    int8_caches = int8 and _os.environ.get(
        'MMVID_ARTV_INT8_WEIGHTS_ONLY') != '1'

    dim = heads * hd

    # Fused decode-block Pallas kernel (ops/artv_decode.py): one program
    # per block per token (weights VMEM-resident, flash-decode over
    # chunked lane-dense caches) instead of ~12 XLA ops.  Read at trace
    # time; requires the flat [n_layers, B, Wpad, D] cache layout below.
    fused = (not int8 and dim % heads == 0
             and _os.environ.get('MMVID_ARTV_FUSED', '0') == '1')
    # interpret only where Mosaic can't compile (host CPU); the axon
    # platform is a real TPU backend and must get the compiled kernel
    fused_interp = jax.default_backend() == 'cpu'
    CH = 128  # cache width granularity for the fused kernel
    if fused:
        from mmvid_tpu.ops.artv_decode import stack_decode_params
        stacked_dec = stack_decode_params(dec_blocks, dim)
    # Flat lane-dense K/V cache layout for the XLA decode path
    # (MMVID_ARTV_FLAT, trace-time): the [..., heads=12, hd=64] minor dims
    # force XLA's tiled layout to pad each (12, 64) slab to (16, 128) —
    # ~2.7x physical cache size.  Storing [.., W, H*D] keeps tiles dense;
    # the attention einsums become broadcast-multiply-reduce fusions over
    # the dense minor axis (same fp32 product/accumulate numerics as the
    # einsums, different only in reduction order).  MEASURED A LOSS on the
    # v5e (b16 133.8 vs 170.8 f/s, b64 113.1 vs 215.9 — ROADMAP round 3):
    # the VPU-side expanded multiply-reduce costs more than the padded
    # tiles save.  Kept only as the documented closed hypothesis; OFF.
    flat = (not int8 and not fused
            and _os.environ.get('MMVID_ARTV_FLAT', '0') == '1')
    # Per-layer SPLIT flat caches (MMVID_ARTV_SPLIT, trace-time, default
    # on): each layer's K/V cache is its own [B, W, D] array (a tuple
    # carry) instead of a slab of the stacked [n_layers, B, W, heads, hd]
    # arrays above.  Two wins, both discovered via the spec-decode chunk
    # loop (artv_spec.py uses exactly this layout): (a) the stacked
    # cache's (heads=12, hd=64) minor dims force XLA's tiled HBM layout
    # to pad each slab to (16, 128) — ~2.7x physical bytes streamed per
    # step on the decode wall; a dense 768-wide minor axis has no pad.
    # (b) the attention einsums read `cache.reshape(B, W, heads, hd)` —
    # UNLIKE the MMVID_ARTV_FLAT experiment above, the contraction stays
    # an einsum (same fp32 numerics, MXU-eligible), not a VPU
    # broadcast-multiply-reduce; the reshape folds into the einsum's
    # operand access pattern rather than relayouting the cache.
    # Measured (v5e, flagship, ROADMAP round-5): 237.9/263.2 f/s b16/b64
    # vs 172.2/216.2 stacked — +38%/+22%.  MMVID_ARTV_SPLIT=0 restores
    # the stacked layout (A/B knob).
    split = (not int8 and not fused and not flat
             and _os.environ.get('MMVID_ARTV_SPLIT', '1') == '1')

    def block_step(p, i, x, cache_k, cache_v, pos):
        """One-token pass through block i, updating the STACKED caches
        [n_layers, B, W, heads, hd] in place (dynamic_update_slice on the
        scan carry aliases — no full-cache copy; a per-layer stack/rebuild
        was measured to double the per-token time at flagship size).
        W is the current (windowed) cache width — see the segment loop.
        x [B, D] fp32; pos scalar."""
        W = cache_k.shape[2]
        h = _ln(p['ln_1'], x)
        qkv = dot(h, p['attn']['qkv'])
        q, k, v = qkv[:, :dim], qkv[:, dim:2 * dim], qkv[:, 2 * dim:]
        q = q.reshape(b, heads, hd)
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k.reshape(1, b, 1, heads, hd).astype(dt),
            (i, 0, pos, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v.reshape(1, b, 1, heads, hd).astype(dt),
            (i, 0, pos, 0, 0))
        logits = jnp.einsum('bhd,blhd->bhl', q.astype(dt), cache_k[i],
                            preferred_element_type=jnp.float32)
        logits = logits * (hd ** -0.5)
        valid = jnp.arange(W)[None, None, :] <= pos
        logits = jnp.where(valid, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum('bhl,blhd->bhd', attn.astype(dt), cache_v[i],
                       preferred_element_type=jnp.float32).reshape(b, -1)
        o = dot(o, p['attn']['out'])
        x = x + o
        h = _ln(p['ln_2'], x)
        h = dot(h, p['mlp']['fc'])
        h = h * jax.nn.sigmoid(1.702 * h)
        h = dot(h, p['mlp']['proj'])
        return x + h, cache_k, cache_v

    def block_step_flat(p, i, x, cache_k, cache_v, pos):
        """block_step over the FLAT [n_layers, B, W, D] caches (see the
        MMVID_ARTV_FLAT note above): QK^T and AV are broadcast-multiply-
        reduce fusions reading the cache's dense minor axis once — fp32
        products and accumulation, matching the einsum path's math up to
        reduction order."""
        W = cache_k.shape[2]
        h = _ln(p['ln_1'], x)
        qkv = dot(h, p['attn']['qkv'])
        q, k, v = qkv[:, :dim], qkv[:, dim:2 * dim], qkv[:, 2 * dim:]
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k.reshape(1, b, 1, dim).astype(dt), (i, 0, pos, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v.reshape(1, b, 1, dim).astype(dt), (i, 0, pos, 0))
        q32 = q.astype(dt).astype(jnp.float32)
        prod = q32[:, None, :] * cache_k[i].astype(jnp.float32)
        logits = prod.reshape(b, W, heads, hd).sum(-1)     # [B, W, H]
        logits = logits * (hd ** -0.5)
        valid = jnp.arange(W)[None, :, None] <= pos
        logits = jnp.where(valid, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=1)              # over W
        rep = jnp.repeat(attn.astype(dt).astype(jnp.float32), hd, axis=2)
        o = (rep * cache_v[i].astype(jnp.float32)).sum(axis=1)  # [B, D]
        o = dot(o, p['attn']['out'])
        x = x + o
        h = _ln(p['ln_2'], x)
        h = dot(h, p['mlp']['fc'])
        h = h * jax.nn.sigmoid(1.702 * h)
        h = dot(h, p['mlp']['proj'])
        return x + h, cache_k, cache_v

    def block_step_split(p, x, ck, cv, pos):
        """One-token pass through one block over its own per-layer FLAT
        [B, W, dim] caches (see the MMVID_ARTV_SPLIT note above).  Same
        einsum formulation and fp32 accumulation as block_step — the
        reshape views the dense cache as [B, W, heads, hd] without
        changing values, so the two paths are numerically identical."""
        W = ck.shape[1]
        h = _ln(p['ln_1'], x)
        qkv = dot(h, p['attn']['qkv'])
        q, k, v = qkv[:, :dim], qkv[:, dim:2 * dim], qkv[:, 2 * dim:]
        ck = jax.lax.dynamic_update_slice(
            ck, k.reshape(b, 1, dim).astype(dt), (0, pos, 0))
        cv = jax.lax.dynamic_update_slice(
            cv, v.reshape(b, 1, dim).astype(dt), (0, pos, 0))
        logits = jnp.einsum('bhd,bwhd->bhw',
                            q.reshape(b, heads, hd).astype(dt),
                            ck.reshape(b, W, heads, hd),
                            preferred_element_type=jnp.float32)
        logits = logits * (hd ** -0.5)
        valid = jnp.arange(W)[None, None, :] <= pos
        logits = jnp.where(valid, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum('bhw,bwhd->bhd', attn.astype(dt),
                       cv.reshape(b, W, heads, hd),
                       preferred_element_type=jnp.float32).reshape(b, -1)
        o = dot(o, p['attn']['out'])
        x = x + o
        h = _ln(p['ln_2'], x)
        h = dot(h, p['mlp']['fc'])
        h = h * jax.nn.sigmoid(1.702 * h)
        h = dot(h, p['mlp']['proj'])
        return x + h, ck, cv

    # ---- prefill: run the control prefix through all blocks, keep K/V ----
    def prefill_block(p, x):
        lp = x.shape[1]
        h = _ln(p['ln_1'], x)
        q = dot(h, p['attn']['query'])
        k = dot(h, p['attn']['key'])
        v = dot(h, p['attn']['value'])
        q = q.reshape(b, lp, heads, hd)
        k = k.reshape(b, lp, heads, hd)
        v = v.reshape(b, lp, heads, hd)
        logits = jnp.einsum('bqhd,bkhd->bhqk', q.astype(dt), k.astype(dt),
                            preferred_element_type=jnp.float32)
        logits = logits * (hd ** -0.5)
        causal = jnp.tril(jnp.ones((lp, lp), bool))
        logits = jnp.where(causal[None, None], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum('bhqk,bkhd->bqhd', attn.astype(dt), v.astype(dt),
                       preferred_element_type=jnp.float32
                       ).reshape(b, lp, -1)
        o = dot(o, p['attn']['out'])
        x = x + o
        h = _ln(p['ln_2'], x)
        h = dot(h, p['mlp']['fc'])
        h = h * jax.nn.sigmoid(1.702 * h)
        h = dot(h, p['mlp']['proj'])
        return x + h, k, v

    x = ctrl_emb
    pre_k, pre_v = [], []
    for i in range(n_layers):
        x, k, v = prefill_block(blocks[i], x)
        pre_k.append(k)
        pre_v.append(v)
    prefix_last = x[:, -1]  # hidden of the last control position

    # ---- windowed K/V caches ----
    # The decode wall is cache streaming: every step reads the full
    # [B, L, heads, hd] K and V per layer even though only positions
    # <= pos are valid.  Splitting generation into per-frame segments
    # (seg_len = tokens/frame) and growing the cache arrays between
    # segments cuts the read to the live window — mean width
    # (ctrl+seg .. L) ~= 0.6 L at flagship shapes.  MMVID_ARTV_WINDOW=0
    # restores a single full-width scan (A/B knob, read at trace time).
    n_gen = cfg.target_seq_len
    n_steps = n_gen - 1
    seg_len = (cfg.image_fmap_size ** 2
               if _os.environ.get('MMVID_ARTV_WINDOW', '1') == '1'
               else n_steps)

    def _wpad(w):
        # fused kernel: widths padded to chunk multiples (rows >= pos are
        # masked inside the kernel, so the pad is semantically inert)
        return -(-w // CH) * CH if fused else w

    W0 = _wpad(min(ctrl_len + seg_len, L))

    if int8_caches:
        # per-(layer, head) cache scales from the prefill range; 1.5x
        # headroom for later tokens (beyond-range values saturate-clip)
        def _cache_scales(pre):
            return jnp.stack([
                jnp.maximum(jnp.max(jnp.abs(t.astype(jnp.float32)),
                                    axis=(0, 1, 3)), 1e-6)
                for t in pre]) * 1.5 / 127.0          # [n_layers, heads]

        k_scales = _cache_scales(pre_k)
        v_scales = _cache_scales(pre_v)

        def _q8(vals, s):
            """[b, l, heads, hd] -> int8 with per-head scales s [heads]."""
            return jnp.round(jnp.clip(
                vals.astype(jnp.float32) / s[None, None, :, None],
                -127.0, 127.0)).astype(jnp.int8)

        cache_k = jnp.zeros((n_layers, b, W0, heads, hd), jnp.int8)
        cache_v = jnp.zeros((n_layers, b, W0, heads, hd), jnp.int8)
        for i in range(n_layers):
            cache_k = cache_k.at[i, :, :ctrl_len].set(
                _q8(pre_k[i], k_scales[i]))
            cache_v = cache_v.at[i, :, :ctrl_len].set(
                _q8(pre_v[i], v_scales[i]))
    elif fused or flat:
        # flat lane-dense layout [n_layers, B, Wpad, D]: the trailing
        # (heads, hd) = (12, 64) split forces a padded (16, 128) tiled
        # layout in HBM (~2.7x physical blowup, measured 4.2x-off-roofline
        # cache streaming) — flattening heads into one 768-wide minor axis
        # restores dense tiles
        cache_k = jnp.zeros((n_layers, b, W0, dim), dt)
        cache_v = jnp.zeros((n_layers, b, W0, dim), dt)
        for i in range(n_layers):
            lp = pre_k[i].shape[1]
            cache_k = cache_k.at[i, :, :ctrl_len].set(
                pre_k[i].reshape(b, lp, dim).astype(dt))
            cache_v = cache_v.at[i, :, :ctrl_len].set(
                pre_v[i].reshape(b, lp, dim).astype(dt))
    elif split:
        # per-layer tuples of dense [B, W0, D] arrays (see the SPLIT note)
        cache_k = tuple(
            jnp.zeros((b, W0, dim), dt).at[:, :ctrl_len].set(
                pre_k[i].reshape(b, ctrl_len, dim).astype(dt))
            for i in range(n_layers))
        cache_v = tuple(
            jnp.zeros((b, W0, dim), dt).at[:, :ctrl_len].set(
                pre_v[i].reshape(b, ctrl_len, dim).astype(dt))
            for i in range(n_layers))
    else:
        cache_k = jnp.zeros((n_layers, b, W0, heads, hd), dt)
        cache_v = jnp.zeros((n_layers, b, W0, heads, hd), dt)
        for i in range(n_layers):
            cache_k = cache_k.at[i, :, :ctrl_len].set(pre_k[i].astype(dt))
            cache_v = cache_v.at[i, :, :ctrl_len].set(pre_v[i].astype(dt))

    def block_step8(p, i, x, cache_k, cache_v, pos):
        """int8 variant of block_step: int8 weight matmuls, plus int8 K/V
        cache traffic unless MMVID_ARTV_INT8_WEIGHTS_ONLY=1."""
        W = cache_k.shape[2]
        h = _ln(p['ln_1'], x)
        qkv = dot8(h, p['attn']['qkv'])
        q = qkv[:, :dim].reshape(b, heads, hd)
        k = qkv[:, dim:2 * dim].reshape(b, 1, heads, hd)
        v = qkv[:, 2 * dim:].reshape(b, 1, heads, hd)
        if int8_caches:
            k_s, v_s = k_scales[i], v_scales[i]      # [heads]
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, _q8(k, k_s)[None], (i, 0, pos, 0, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, _q8(v, v_s)[None], (i, 0, pos, 0, 0))
            q_s = jnp.maximum(jnp.max(jnp.abs(q), axis=-1), 1e-6) / 127.0
            q_q = jnp.round(q / q_s[..., None]).astype(jnp.int8)
            acc = jnp.einsum('bhd,blhd->bhl', q_q, cache_k[i],
                             preferred_element_type=jnp.int32)
            logits = (acc.astype(jnp.float32)
                      * (q_s[:, :, None] * k_s[None, :, None])
                      * (hd ** -0.5))
        else:
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, k.astype(dt)[None], (i, 0, pos, 0, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, v.astype(dt)[None], (i, 0, pos, 0, 0))
            logits = jnp.einsum('bhd,blhd->bhl', q.astype(dt), cache_k[i],
                                preferred_element_type=jnp.float32
                                ) * (hd ** -0.5)
        valid = jnp.arange(W)[None, None, :] <= pos
        logits = jnp.where(valid, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        if int8_caches:
            p_q = jnp.round(attn * 127.0).astype(jnp.int8)  # probs in [0,1]
            acc2 = jnp.einsum('bhl,blhd->bhd', p_q, cache_v[i],
                              preferred_element_type=jnp.int32)
            o = (acc2.astype(jnp.float32) * (v_s[None, :, None] / 127.0)
                 ).reshape(b, -1)
        else:
            o = jnp.einsum('bhl,blhd->bhd', attn.astype(dt), cache_v[i],
                           preferred_element_type=jnp.float32
                           ).reshape(b, -1)
        o = dot8(o, p['attn']['out'])
        x = x + o
        h = _ln(p['ln_2'], x)
        h = dot8(h, p['mlp']['fc'])
        h = h * jax.nn.sigmoid(1.702 * h)
        h = dot8(h, p['mlp']['proj'])
        return x + h, cache_k, cache_v

    ln_p = params['to_logits_ln']
    # image-range slice of the output head, cast once: only these columns
    # survive sample_tok, the rest of the ~51k-vocab matmul is dead work
    fc_k = params['to_logits_fc']['kernel'][
        :, cfg.num_control_tokens:].astype(dt)
    fc_b = params['to_logits_fc']['bias'][cfg.num_control_tokens:]
    head8 = quant_weight(
        {'kernel': params['to_logits_fc']['kernel'][
            :, cfg.num_control_tokens:],
         'bias': fc_b}) if int8 else None

    def image_logits(hidden):
        h = _ln(ln_p, hidden)
        if int8:
            return dot8(h, head8)
        return (jnp.dot(h.astype(dt), fc_k,
                        preferred_element_type=jnp.float32) + fc_b)

    k_img = max(int((1 - filter_thres) * cfg.total_tokens), 1)
    k_img = min(k_img, cfg.num_image_tokens)

    def sample_tok(key, logits):
        # top-k filter in the (only-finite) image range (dalle_artv.py:61-67)
        if k_img < cfg.num_image_tokens:
            thresh = jnp.sort(logits, axis=-1)[:, -k_img][:, None]
            logits = jnp.where(logits < thresh, -jnp.inf, logits)
        return jax.random.categorical(key, logits / temperature, axis=-1)

    key, k0 = jax.random.split(key)
    tok0 = sample_tok(k0, image_logits(prefix_last))

    def step(carry, inp):
        cache_k, cache_v, tok, key = carry
        step_i, = inp
        pos = ctrl_len + step_i           # cache position of this token
        emb = (image_emb_table[tok] + pos_emb_full[:, step_i]
               ).astype(jnp.float32)
        x = emb
        if fused:
            from mmvid_tpu.ops.artv_decode import decode_token_step
            x, k_new, v_new = decode_token_step(
                x, stacked_dec, cache_k, cache_v, pos, heads,
                interpret=fused_interp)
            # one stacked in-place write per token for ALL layers (the
            # kernel handles the current token's k/v in-register)
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, k_new[:, :, None, :], (0, 0, pos, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, v_new[:, :, None, :], (0, 0, pos, 0))
        elif split:
            new_k, new_v = [], []
            for i in range(n_layers):
                x, nk, nv = block_step_split(dec_blocks[i], x, cache_k[i],
                                             cache_v[i], pos)
                new_k.append(nk)
                new_v.append(nv)
            cache_k, cache_v = tuple(new_k), tuple(new_v)
        else:
            for i in range(n_layers):
                if int8:
                    x, cache_k, cache_v = block_step8(blocks8[i], i, x,
                                                      cache_k, cache_v,
                                                      pos)
                elif flat:
                    x, cache_k, cache_v = block_step_flat(
                        dec_blocks[i], i, x, cache_k, cache_v, pos)
                else:
                    x, cache_k, cache_v = block_step(dec_blocks[i], i, x,
                                                     cache_k, cache_v,
                                                     pos)
        key, ks = jax.random.split(key)
        nxt = sample_tok(ks, image_logits(x))
        return (cache_k, cache_v, nxt, key), tok

    # Feed token i at step i (cache position ctrl_len+i) and sample token
    # i+1; the final token is never fed back (the reference's last forward
    # sees total_seq_len positions, dalle_artv.py:258-281), so the loop
    # runs n_gen-1 steps and the last sample completes the sequence.
    # One lax.scan per window segment; the caches grow between segments
    # (the pad is a once-per-segment copy, amortized over seg_len steps).
    # RNG split order is identical across segmentations, and masked-out
    # positions contribute exact zeros to both einsums, so the windowed
    # and full-width paths produce the same tokens.
    fed_parts = []
    carry = (cache_k, cache_v, tok0, key)
    for s in range(-(-n_steps // seg_len)):
        start, stop = s * seg_len, min((s + 1) * seg_len, n_steps)
        W = _wpad(min(ctrl_len + stop, L))
        if split:
            grow = W - carry[0][0].shape[1]
            if grow > 0:
                gpad = ((0, 0), (0, grow), (0, 0))
                carry = (tuple(jnp.pad(ck, gpad) for ck in carry[0]),
                         tuple(jnp.pad(cv, gpad) for cv in carry[1]),
                         carry[2], carry[3])
        else:
            grow = W - carry[0].shape[2]
            if grow > 0:
                pad = [(0, 0)] * carry[0].ndim
                pad[2] = (0, grow)
                carry = (jnp.pad(carry[0], pad), jnp.pad(carry[1], pad),
                         carry[2], carry[3])
        carry, fed = jax.lax.scan(step, carry, (jnp.arange(start, stop),))
        fed_parts.append(fed)
    last_tok = carry[2]
    fed = (jnp.concatenate(fed_parts, axis=0) if fed_parts
           else jnp.zeros((0, b), tok0.dtype))
    out = jnp.concatenate(
        [jnp.moveaxis(fed, 0, 1), last_tok[:, None]], axis=1)  # [B, n_gen]
    out = out.astype(jnp.int32)
    if return_steps:
        # baseline: one loop token per step (exactly n_steps chunk-
        # equivalents) — keeps generate_images' stats plumbing uniform
        return out, jnp.full((b,), n_steps, jnp.int32)
    return out
