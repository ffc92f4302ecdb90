"""VQGAN image tokenizer (taming-transformers VQModel architecture), TPU-native.

Architecture parity with the reference config
``mmvid_pytorch/data/vqgan.1024.config.yml`` and modules:

* Encoder/Decoder conv stacks: taming/modules/diffusionmodules/model.py:363-583
  (GroupNorm(32, eps=1e-6) + swish, ResnetBlocks, single-head AttnBlock at the
  configured attention resolutions, conv down/upsampling).
* Vector quantizer: taming/modules/vqvae/quantize.py:230-358
  (nearest-neighbour lookup + straight-through estimator, beta=0.25).
* VQModel wiring (encoder -> 1x1 quant_conv -> quantize; embedding ->
  1x1 post_quant_conv -> decoder): taming/models/vqgan.py:16-80.
* MMVID-facing wrapper semantics: mmvid_pytorch/vae.py:15-71
  ([0,1] -> [-1,1] on encode, clamp+rescale to [0,1] on decode,
  num_layers=4, num_tokens=1024).

TPU-first design decisions (not translations):
* NHWC layout end-to-end (feeds the MXU's native conv layout; torch weights
  are transposed once at load time by mmvid_tpu.utils.torch_compat).
* Compute dtype is configurable (bf16 on TPU); GroupNorm statistics and the
  codebook distance/argmin always run in fp32 islands.
* The codebook lookup is a fused matmul+argmin (mmvid_tpu.ops.codebook),
  optionally a Pallas kernel that pins the codebook in VMEM.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmvid_tpu.ops.codebook import nearest_codebook_indices


@dataclasses.dataclass(frozen=True)
class VQGanConfig:
    """vqgan.1024.config.yml defaults (reference mmvid_pytorch/data/...)."""
    embed_dim: int = 256
    n_embed: int = 1024
    double_z: bool = False
    z_channels: int = 256
    resolution: int = 256
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.0
    # w8a8 int8 serving path for the DECODER convs (ops/int8.py): sorted
    # ('decoder/<module path>/<conv name>', activation_scale) pairs from
    # mmvid_tpu.ops.int8.quantize_vae_decoder.  None = bf16/fp32 path.
    # Serving-only; the encode path (training) is never quantized.
    int8_scales: Any = None

    @property
    def num_layers(self) -> int:
        return len(self.ch_mult) - 1

    def fmap_size(self, image_size: int) -> int:
        return image_size // (2 ** self.num_layers)


def _norm(name: str, dtype=jnp.float32):
    # GroupNorm(32, eps=1e-6) in fp32 regardless of compute dtype
    # (taming model.py:38-42).
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                        name=name)


class _ConvParams(nn.Module):
    """Holds an nn.Conv's kernel/bias without applying it (identical param
    tree and init, for the int8 path that consumes raw weights)."""
    features: int
    ksize: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            self.ksize + (x.shape[-1], self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        return kernel, bias


def _conv(mod: nn.Module, x, features: int, ksize, name: str,
          int8_scales=None):
    """Stride-1 SAME conv site that (a) sows its input |x| quantile
    record when a CALIB_COL collection is mutable and (b) runs the int8
    MXU path when the module's path has a calibrated scale in
    ``int8_scales``."""
    from mmvid_tpu.ops.int8 import CALIB_COL, calib_stats, quantized_conv
    if mod.is_mutable_collection(CALIB_COL):
        mod.sow(CALIB_COL, f'{name}_in', calib_stats(x))
    sc = None
    if int8_scales:
        sc = dict(int8_scales).get('/'.join(tuple(mod.path) + (name,)))
    if sc is None:
        return nn.Conv(features, ksize, dtype=mod.dtype, name=name)(x)
    kernel, bias = _ConvParams(features, tuple(ksize), name=name)(x)
    return quantized_conv(x, kernel, bias, sc)


class ResnetBlock(nn.Module):
    """taming model.py:87-148 (temb unused in VQGAN: temb_channels=0)."""
    in_channels: int
    out_channels: int
    dtype: Any = jnp.float32
    int8_scales: Any = None

    @nn.compact
    def __call__(self, x):
        sc = self.int8_scales
        h = _norm('norm1')(x)
        h = nn.silu(h).astype(self.dtype)
        h = _conv(self, h, self.out_channels, (3, 3), 'conv1', sc)
        h = _norm('norm2')(h)
        h = nn.silu(h).astype(self.dtype)
        h = _conv(self, h, self.out_channels, (3, 3), 'conv2', sc)
        if self.in_channels != self.out_channels:
            x = _conv(self, x, self.out_channels, (1, 1), 'nin_shortcut',
                      sc)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention (taming model.py:153-205)."""
    channels: int
    dtype: Any = jnp.float32
    int8_scales: Any = None

    @nn.compact
    def __call__(self, x):
        sc = self.int8_scales
        b, hh, ww, c = x.shape
        h = _norm('norm')(x).astype(self.dtype)
        q = _conv(self, h, c, (1, 1), 'q', sc)
        k = _conv(self, h, c, (1, 1), 'k', sc)
        v = _conv(self, h, c, (1, 1), 'v', sc)
        q = q.reshape(b, hh * ww, c)
        k = k.reshape(b, hh * ww, c)
        v = v.reshape(b, hh * ww, c)
        attn = jnp.einsum('bic,bjc->bij', q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * (c ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum('bij,bjc->bic', attn, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, hh, ww, c).astype(self.dtype)
        out = _conv(self, out, c, (1, 1), 'proj_out', sc)
        return x + out


class Downsample(nn.Module):
    """Asymmetric-padded stride-2 conv (taming model.py:65-84)."""
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding='VALID',
                       dtype=self.dtype, name='conv')(x)


class Upsample(nn.Module):
    """Nearest x2 + conv (taming model.py:45-62)."""
    channels: int
    dtype: Any = jnp.float32
    int8_scales: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method='nearest')
        return _conv(self, x, self.channels, (3, 3), 'conv',
                     self.int8_scales)


class Encoder(nn.Module):
    """taming model.py:363-466."""
    cfg: VQGanConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = x.astype(self.dtype)
        h = nn.Conv(cfg.ch, (3, 3), dtype=self.dtype, name='conv_in')(x)

        curr_res = cfg.resolution
        in_ch_mult = (1,) + tuple(cfg.ch_mult)
        num_resolutions = len(cfg.ch_mult)
        for i_level in range(num_resolutions):
            block_in = cfg.ch * in_ch_mult[i_level]
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(block_in, block_out, dtype=self.dtype,
                                name=f'down_{i_level}_block_{i_block}')(h)
                block_in = block_out
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(block_in, dtype=self.dtype,
                                  name=f'down_{i_level}_attn_{i_block}')(h)
            if i_level != num_resolutions - 1:
                h = Downsample(block_in, dtype=self.dtype,
                               name=f'down_{i_level}_downsample')(h)
                curr_res //= 2

        h = ResnetBlock(block_in, block_in, dtype=self.dtype,
                        name='mid_block_1')(h)
        h = AttnBlock(block_in, dtype=self.dtype, name='mid_attn_1')(h)
        h = ResnetBlock(block_in, block_in, dtype=self.dtype,
                        name='mid_block_2')(h)

        h = _norm('norm_out')(h)
        h = nn.silu(h).astype(self.dtype)
        z_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        h = nn.Conv(z_ch, (3, 3), dtype=self.dtype, name='conv_out')(h)
        return h


class Decoder(nn.Module):
    """taming model.py:469-583."""
    cfg: VQGanConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        sc = cfg.int8_scales
        z = z.astype(self.dtype)
        num_resolutions = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[num_resolutions - 1]
        curr_res = cfg.resolution // 2 ** (num_resolutions - 1)

        h = _conv(self, z, block_in, (3, 3), 'conv_in', sc)
        h = ResnetBlock(block_in, block_in, dtype=self.dtype,
                        int8_scales=sc, name='mid_block_1')(h)
        h = AttnBlock(block_in, dtype=self.dtype, int8_scales=sc,
                      name='mid_attn_1')(h)
        h = ResnetBlock(block_in, block_in, dtype=self.dtype,
                        int8_scales=sc, name='mid_block_2')(h)

        for i_level in reversed(range(num_resolutions)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(block_in, block_out, dtype=self.dtype,
                                int8_scales=sc,
                                name=f'up_{i_level}_block_{i_block}')(h)
                block_in = block_out
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(block_in, dtype=self.dtype,
                                  int8_scales=sc,
                                  name=f'up_{i_level}_attn_{i_block}')(h)
            if i_level != 0:
                h = Upsample(block_in, dtype=self.dtype, int8_scales=sc,
                             name=f'up_{i_level}_upsample')(h)
                curr_res *= 2

        h = _norm('norm_out')(h)
        h = nn.silu(h).astype(self.dtype)
        h = _conv(self, h, cfg.out_ch, (3, 3), 'conv_out', sc)
        return h


class VectorQuantizer(nn.Module):
    """Nearest-neighbour VQ with straight-through gradient
    (taming quantize.py:230-358, legacy=True beta placement)."""
    n_embed: int
    embed_dim: int
    beta: float = 0.25

    def setup(self):
        self.embedding = self.param(
            'embedding',
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / self.n_embed,
                maxval=1.0 / self.n_embed),
            (self.n_embed, self.embed_dim))

    def __call__(self, z):
        """z [B,H,W,C] -> (z_q, loss, indices [B,H,W])."""
        z32 = z.astype(jnp.float32)
        idx = nearest_codebook_indices(z32, self.embedding)
        z_q = self.embedding[idx]
        # legacy beta placement (quantize.py:316-322)
        loss = (jnp.mean((jax.lax.stop_gradient(z_q) - z32) ** 2)
                + self.beta * jnp.mean((z_q - jax.lax.stop_gradient(z32)) ** 2))
        z_q = z32 + jax.lax.stop_gradient(z_q - z32)  # straight-through
        return z_q.astype(z.dtype), loss, idx

    def lookup(self, indices):
        return self.embedding[indices]


class GumbelQuantize(nn.Module):
    """Gumbel-softmax quantizer (taming quantize.py:113-227, GumbelVQ
    variant vqgan.py:378-463): a 1x1 conv projects features to codebook
    logits; training samples a soft one-hot via gumbel-softmax (straight-
    through hard sample at eval), with a KL-to-uniform regularizer."""
    n_embed: int
    embed_dim: int
    straight_through: bool = True
    kl_weight: float = 5e-4

    @nn.compact
    def __call__(self, z, *, temp: float = 1.0, train: bool = False,
                 rng=None):
        logits = nn.Conv(self.n_embed, (1, 1), name='proj')(z)
        embed = self.param(
            'embedding',
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / self.n_embed,
                maxval=1.0 / self.n_embed),
            (self.n_embed, self.embed_dim))
        if train:
            rng = rng if rng is not None else self.make_rng('gumbel')
            g = -jnp.log(-jnp.log(
                jax.random.uniform(rng, logits.shape, minval=1e-20)))
            soft = jax.nn.softmax((logits + g) / temp, axis=-1)
        else:
            soft = jax.nn.one_hot(jnp.argmax(logits, -1), self.n_embed)
        if self.straight_through and train:
            hard = jax.nn.one_hot(jnp.argmax(soft, -1), self.n_embed)
            soft = soft + jax.lax.stop_gradient(hard - soft)
        z_q = jnp.einsum('bhwn,nd->bhwd', soft, embed)
        probs = jax.nn.softmax(logits, axis=-1)
        kl = self.kl_weight * jnp.mean(
            jnp.sum(probs * jnp.log(probs * self.n_embed + 1e-10), axis=-1))
        idx = jnp.argmax(soft, axis=-1).astype(jnp.int32)
        return z_q, kl, idx


class VQModel(nn.Module):
    """taming/models/vqgan.py:16-80 (runtime surface only; GAN training
    losses live in mmvid_tpu.models.vqgan_losses)."""
    cfg: VQGanConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)
        self.quantize = VectorQuantizer(self.cfg.n_embed, self.cfg.embed_dim)
        self.quant_conv = nn.Conv(self.cfg.embed_dim, (1, 1),
                                  dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1),
                                       dtype=self.dtype)

    def encode(self, x):
        """x [B,H,W,3] in [-1,1] -> (z_q, emb_loss, indices [B,H,W])."""
        h = self.encoder(x)
        h = self.quant_conv(h)
        return self.quantize(h)

    def encode_indices(self, x):
        h = self.encoder(x)
        h = self.quant_conv(h).astype(jnp.float32)
        return nearest_codebook_indices(h, self.quantize.embedding)

    def decode_latent(self, quant):
        quant = self.post_quant_conv(quant)
        return self.decoder(quant)

    def decode_code(self, code):
        """code [B,H,W] int -> image [B,H',W',3] in [-1,1]."""
        quant = self.quantize.lookup(code).astype(self.dtype)
        return self.decode_latent(quant)

    def __call__(self, x):
        quant, diff, _ = self.encode(x)
        return self.decode_latent(quant), diff


class VQGanVAE:
    """MMVID-facing VQGAN wrapper (reference mmvid_pytorch/vae.py:15-71).

    Stateless functional wrapper: holds config + params, exposes jitted
    `get_codebook_indices` ([0,1] images -> token ids) and `decode`
    (token ids -> [0,1] images).  ``image_size`` follows the reference's
    override semantics (train.py:182-185): the wrapper reports the runtime
    image size while the module config keeps the checkpoint resolution.
    """

    def __init__(self, params=None, image_size: int | None = None,
                 cfg: VQGanConfig | None = None, dtype=jnp.float32):
        self.cfg = cfg or VQGanConfig()
        if image_size:
            self.cfg = dataclasses.replace(self.cfg, resolution=image_size)
        self.module = VQModel(self.cfg, dtype=dtype)
        self.image_size = image_size or 256
        # The reference hardcodes num_layers=4, num_tokens=1024 (vae.py:34-36)
        # for the shipped config; derive from cfg so alternate configs report
        # the true token grid.
        self.num_layers = self.cfg.num_layers
        self.num_tokens = self.cfg.n_embed
        self.fmap_size = self.image_size // (2 ** self.num_layers)
        self.image_seq_len = self.fmap_size ** 2
        if params is None:
            params = self.init_params(jax.random.PRNGKey(0))
        self.params = params
        self._encode = jax.jit(self._encode_impl)
        self._decode = jax.jit(self._decode_impl)

    def init_params(self, key):
        x = jnp.zeros((1, self.image_size, self.image_size, 3))
        return self.module.init(key, x)['params']

    # --- impls (also usable untraced inside a larger jit) ---
    def _encode_impl(self, params, img):
        """img [B,H,W,3] in [0,1] -> [B, n] int32 (vae.py:38-43)."""
        x = 2.0 * img - 1.0
        idx = self.module.apply({'params': params}, x,
                                method=VQModel.encode_indices)
        return idx.reshape(idx.shape[0], -1)

    def _decode_impl(self, params, seq):
        """seq [B, n] -> img [B,H,W,3] in [0,1] (vae.py:45-56)."""
        b, n = seq.shape
        f = int(n ** 0.5)
        code = seq.reshape(b, f, f)
        img = self.module.apply({'params': params}, code,
                                method=VQModel.decode_code)
        return (jnp.clip(img, -1.0, 1.0) + 1.0) * 0.5

    # --- public API (mirrors reference names) ---
    def get_codebook_indices(self, img):
        return self._encode(self.params, img)

    def decode(self, seq):
        return self._decode(self.params, seq)

    def codebook(self):
        return self.params['quantize']['embedding']
