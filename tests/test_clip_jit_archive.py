"""End-to-end ViT-B-32.pt-style loading: build a real torch.jit archive of
the reference CLIP, then load it through load_clip_scorer /
load_openai_clip_stack — the exact code path the released checkpoint takes
(clip_model.py:535)."""

import numpy as np
import pytest

import jax.numpy as jnp

from oracles import install_reference

SMALL = dict(embed_dim=32, image_resolution=32, vision_layers=2,
             vision_width=64, vision_patch_size=16, context_length=12,
             vocab_size=100, transformer_width=64, transformer_heads=1,
             transformer_layers=2)


@pytest.fixture(scope='module')
def jit_archive(tmp_path_factory):
    install_reference()
    import torch
    torch.manual_seed(11)
    from mmvid_pytorch.transformers.clip_model import CLIP

    model = CLIP(**SMALL).float().eval()
    img = torch.zeros(1, 3, 32, 32)
    txt = torch.zeros(1, 12, dtype=torch.long)
    txt[0, -1] = 99
    traced = torch.jit.trace(model, (img, txt))
    path = tmp_path_factory.mktemp('jit') / 'tiny-clip.pt'
    torch.jit.save(traced, str(path))
    return str(path), model


def test_load_clip_scorer_from_jit(jit_archive):
    import torch
    path, ref = jit_archive
    from mmvid_tpu.models.clip_full import load_clip_scorer

    scorer = load_clip_scorer(path)
    assert scorer.cfg.vision_width == 64
    assert scorer.cfg.context_length == 12

    rng = np.random.RandomState(0)
    text = rng.randint(1, 90, (2, 12))
    text[:, -1] = 99
    with torch.no_grad():
        ref_emb = ref.encode_text(torch.from_numpy(text).long()).numpy()
    emb = np.asarray(scorer.encode_text(jnp.asarray(text)))
    np.testing.assert_allclose(emb, ref_emb, rtol=2e-4, atol=2e-4)


def test_load_openai_clip_stack_from_jit(jit_archive):
    path, ref = jit_archive
    from mmvid_tpu.models.clip import load_openai_clip_stack

    cfg, params = load_openai_clip_stack(path, 'openai_clip_visual')
    assert cfg.width == 64 and cfg.layers == 2
    assert 'blocks_0' in params and 'blocks_1' in params

    cfg_t, params_t = load_openai_clip_stack(path, 'openai_clip_text')
    assert cfg_t.width == 64 and cfg_t.layers == 2


def test_get_dalle_initializes_from_pretrained_clip(jit_archive, tmp_path):
    """Training builds its backbone FROM the jit archive (reference
    clip_model.py:535-543 via dalle_bert.py:396-405): get_dalle must graft
    the converted resblock params into the fresh model."""
    import jax
    path, _ = jit_archive
    from mmvid_tpu import factories
    from mmvid_tpu.config import process_args
    from mmvid_tpu.models.clip import load_openai_clip_stack
    from mmvid_tpu.models.vqgan import VQGanConfig, VQGanVAE

    args = process_args(train=True, argv=[
        '--name', 't', '--image_text_folder', str(tmp_path),
        '--dataset', 'video_text', '--dim', '64',
        '--which_transformer', 'openai_clip_visual',
        '--openai_clip_model_path', path,
        '--text_seq_len', '8', '--num_targets', '2', '--image_size', '32'])
    vq_cfg = VQGanConfig(resolution=32, ch=32, ch_mult=(1, 2),
                         num_res_blocks=1, z_channels=64, embed_dim=64,
                         n_embed=1024, attn_resolutions=())
    vae = VQGanVAE(image_size=32, cfg=vq_cfg)
    model = factories.get_dalle(args, vae)

    _, expected = load_openai_clip_stack(path, 'openai_clip_visual')
    got = model.params['transformer']
    assert set(got) == set(expected)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(got)[0],
            jax.tree_util.tree_flatten_with_path(expected)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6,
            err_msg=jax.tree_util.keystr(kp))

    # missing archive -> loud warning + random init, not a crash
    args2 = process_args(train=True, argv=[
        '--name', 't', '--image_text_folder', str(tmp_path),
        '--dataset', 'video_text', '--dim', '64',
        '--which_transformer', 'custom:64:2:2',
        '--text_seq_len', '8', '--num_targets', '2', '--image_size', '32'])
    factories.get_dalle(args2, vae)

    import warnings as w
    args3 = process_args(train=True, argv=[
        '--name', 't', '--image_text_folder', str(tmp_path),
        '--dataset', 'video_text', '--dim', '768',
        '--which_transformer', 'openai_clip_visual',
        '--openai_clip_model_path', str(tmp_path / 'missing.pt'),
        '--text_seq_len', '8', '--num_targets', '2', '--image_size', '32'])
    with w.catch_warnings(record=True) as rec:
        w.simplefilter('always')
        factories.get_dalle(args3, vae)
    assert any('RANDOMLY initialized' in str(r.message) for r in rec)
