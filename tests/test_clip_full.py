"""Full CLIP (image + text encoders) parity vs the reference CLIP rebuild."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.clip_full import (
    ClipConfig,
    ClipText,
    ClipVisual,
    convert_clip_full,
)

from oracles import install_reference

# heads follow the width//64 convention that convert_clip_full derives from
# real OpenAI checkpoints (reference build_model, clip_model.py:496)
SMALL = dict(embed_dim=32, image_resolution=32, vision_layers=2,
             vision_width=64, vision_patch_size=16, context_length=12,
             vocab_size=100, transformer_width=64, transformer_heads=1,
             transformer_layers=2)


@pytest.fixture(scope='module')
def ref_clip():
    install_reference()
    import torch
    torch.manual_seed(7)
    from mmvid_pytorch.transformers.clip_model import CLIP
    ref = CLIP(**SMALL)
    ref.float().eval()
    return ref


def test_clip_visual_parity(ref_clip):
    import torch
    sd = {k: v.detach().float().numpy()
          for k, v in ref_clip.state_dict().items()}
    cfg, visual_params, text_params = convert_clip_full(sd)
    assert cfg.vision_width == 64 and cfg.transformer_layers == 2

    rng = np.random.RandomState(0)
    img = rng.randn(2, 32, 32, 3).astype(np.float32)

    with torch.no_grad():
        out_ref = ref_clip.encode_image(
            torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()

    model = ClipVisual(cfg)
    out = model.apply({'params': visual_params}, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=2e-4,
                               atol=2e-4)


def test_clip_text_parity(ref_clip):
    import torch
    sd = {k: v.detach().float().numpy()
          for k, v in ref_clip.state_dict().items()}
    cfg, _, text_params = convert_clip_full(sd)

    rng = np.random.RandomState(1)
    text = rng.randint(1, 90, size=(2, 12))
    text[:, -1] = 99  # EOT-like max token at the end
    with torch.no_grad():
        out_ref = ref_clip.encode_text(torch.from_numpy(text).long()).numpy()

    model = ClipText(cfg)
    out = model.apply({'params': text_params}, jnp.asarray(text))
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=2e-4,
                               atol=2e-4)
