"""Full CLIP model (image + text encoders) in Flax.

Parity target: mmvid_pytorch/transformers/clip_model.py:250-432 (the OpenAI
CLIP rebuild): ViT image encoder (patch conv, class token, ln_pre/ln_post,
projection) and the text encoder (token embedding, causal 77-token
transformer, ln_final, projection at the argmax-token position).  Used for
the CLIP-score metric (utils/utils.py:62-85, utils/utils_eval.py:226-323)
and to load ViT-B-32.pt end to end.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mmvid_tpu.models.clip import (
    ClipStackConfig,
    TransformerStack,
    build_attention_mask,
    _ln,
)


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    embed_dim: int = 512
    image_resolution: int = 224
    vision_width: int = 768
    vision_layers: int = 12
    vision_patch_size: int = 32
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_layers: int = 12

    @property
    def vision_heads(self):
        return self.vision_width // 64

    @property
    def transformer_heads(self):
        return self.transformer_width // 64


class ClipVisual(nn.Module):
    cfg: ClipConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x [B,H,W,3] (CLIP-normalized) -> [B, embed_dim]."""
        cfg = self.cfg
        p = cfg.vision_patch_size
        x = nn.Conv(cfg.vision_width, (p, p), strides=(p, p), padding='VALID',
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        b, gh, gw, w = x.shape
        x = x.reshape(b, gh * gw, w)
        cls = self.param('class_embedding',
                         nn.initializers.normal(cfg.vision_width ** -0.5),
                         (cfg.vision_width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, w)).astype(x.dtype), x], axis=1)
        pos = self.param('positional_embedding',
                         nn.initializers.normal(cfg.vision_width ** -0.5),
                         (gh * gw + 1, cfg.vision_width))
        x = x + pos[None]
        x = _ln('ln_pre')(x)
        x = TransformerStack(
            ClipStackConfig(cfg.vision_width, cfg.vision_layers,
                            cfg.vision_heads),
            dtype=self.dtype, name='transformer')(x, None)
        x = _ln('ln_post')(x[:, 0, :])
        proj = self.param('proj',
                          nn.initializers.normal(cfg.vision_width ** -0.5),
                          (cfg.vision_width, cfg.embed_dim))
        return x @ proj


class ClipText(nn.Module):
    cfg: ClipConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text):
        """text [B, context_length] int -> [B, embed_dim]; features taken at
        the argmax token position (EOT has the highest id)."""
        cfg = self.cfg
        tok = nn.Embed(cfg.vocab_size, cfg.transformer_width,
                       embedding_init=nn.initializers.normal(0.02),
                       name='token_embedding')(text)
        pos = self.param('positional_embedding',
                         nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.transformer_width))
        x = tok + pos[None, :text.shape[1]]
        mask = build_attention_mask(text.shape[1], 'causal')
        x = TransformerStack(
            ClipStackConfig(cfg.transformer_width, cfg.transformer_layers,
                            cfg.transformer_heads),
            dtype=self.dtype, name='transformer')(x, mask)
        x = _ln('ln_final')(x)
        eot = jnp.argmax(text, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param(
            'text_projection',
            nn.initializers.normal(cfg.transformer_width ** -0.5),
            (cfg.transformer_width, cfg.embed_dim))
        return x @ proj


# CLIP image normalization constants (OpenAI)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(images: jax.Array, resolution: int = 224,
                    method: str = 'nearest') -> jax.Array:
    """[B,H,W,3] in [0,1] -> CLIP-normalized [B,res,res,3].

    Default resize is nearest: the reference's clip_similarity upsamples
    with F.interpolate's default mode (utils/utils.py:66-67)."""
    b, h, w, c = images.shape
    x = jax.image.resize(images, (b, resolution, resolution, c),
                         method=method)
    return (x - CLIP_MEAN) / CLIP_STD


class CLIPScorer:
    """encode_image / encode_text with params loaded from ViT-B-32.pt."""

    def __init__(self, cfg: ClipConfig, visual_params, text_params,
                 dtype=jnp.float32):
        self.cfg = cfg
        self.visual = ClipVisual(cfg, dtype=dtype)
        self.text = ClipText(cfg, dtype=dtype)
        self.visual_params = visual_params
        self.text_params = text_params
        self._ei = jax.jit(lambda p, x: self.visual.apply(
            {'params': p}, clip_preprocess(x, cfg.image_resolution)))
        self._et = jax.jit(lambda p, t: self.text.apply({'params': p}, t))

    def encode_image(self, images01):
        return self._ei(self.visual_params, images01)

    def encode_text(self, tokens):
        return self._et(self.text_params, tokens)

    def similarity(self, tokens, images01):
        a = self.encode_text(tokens)
        b = self.encode_image(images01)
        a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
        return jnp.sum(a * b, axis=-1)


# ---------------------------------------------------------------------------
# Weight conversion from the OpenAI jit archive / state_dict
# ---------------------------------------------------------------------------

def convert_clip_full(sd: Dict[str, np.ndarray]
                      ) -> Tuple[ClipConfig, Dict, Dict]:
    """CLIP state_dict -> (config, visual_params, text_params)."""
    from mmvid_tpu.utils.torch_compat import convert_clip_resblocks

    vision_width = sd['visual.conv1.weight'].shape[0]
    vision_patch = sd['visual.conv1.weight'].shape[-1]
    vision_layers = len({k.split('.')[3] for k in sd
                         if k.startswith('visual.transformer.resblocks.')})
    grid = int(round((sd['visual.positional_embedding'].shape[0] - 1)
                     ** 0.5))
    cfg = ClipConfig(
        embed_dim=sd['text_projection'].shape[1],
        image_resolution=vision_patch * grid,
        vision_width=vision_width, vision_layers=vision_layers,
        vision_patch_size=vision_patch,
        context_length=sd['positional_embedding'].shape[0],
        vocab_size=sd['token_embedding.weight'].shape[0],
        transformer_width=sd['ln_final.weight'].shape[0],
        transformer_layers=len({k.split('.')[2] for k in sd
                                if k.startswith('transformer.resblocks.')}))

    f32 = lambda x: np.asarray(x, np.float32)
    visual = {
        'conv1': {'kernel': np.transpose(f32(sd['visual.conv1.weight']),
                                         (2, 3, 1, 0))},
        'class_embedding': f32(sd['visual.class_embedding']),
        'positional_embedding': f32(sd['visual.positional_embedding']),
        'ln_pre': {'scale': f32(sd['visual.ln_pre.weight']),
                   'bias': f32(sd['visual.ln_pre.bias'])},
        'transformer': convert_clip_resblocks(sd, 'visual.transformer'),
        'ln_post': {'scale': f32(sd['visual.ln_post.weight']),
                    'bias': f32(sd['visual.ln_post.bias'])},
        'proj': f32(sd['visual.proj']),
    }
    text = {
        'token_embedding': {'embedding': f32(sd['token_embedding.weight'])},
        'positional_embedding': f32(sd['positional_embedding']),
        'transformer': convert_clip_resblocks(sd, 'transformer'),
        'ln_final': {'scale': f32(sd['ln_final.weight']),
                     'bias': f32(sd['ln_final.bias'])},
        'text_projection': f32(sd['text_projection']),
    }
    return cfg, visual, text


def load_clip_scorer(model_path: str, dtype=jnp.float32) -> CLIPScorer:
    from mmvid_tpu.utils.torch_compat import load_torchjit_state_dict
    sd = load_torchjit_state_dict(model_path)
    cfg, visual, text = convert_clip_full(sd)
    return CLIPScorer(cfg, visual, text, dtype=dtype)
