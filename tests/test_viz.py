"""Visualization: occlusion overlays, sample grids, PNAG debug grids
(reference utils/utils_train.py:391-1217, 456-520, 578-590)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.bert import BertConfig
from mmvid_tpu.models.clip import ClipStackConfig
from mmvid_tpu.models.mmvid import MMVIDBert
from mmvid_tpu.models.vqgan import VQGanConfig, VQGanVAE
from mmvid_tpu.utils.viz import render_visual_prompt, visualize_train


@pytest.fixture(scope='module')
def tiny_visual_model():
    vq_cfg = VQGanConfig(resolution=16, ch=32, ch_mult=(1, 2),
                         num_res_blocks=1, z_channels=64, embed_dim=64,
                         n_embed=1024, attn_resolutions=())
    vae = VQGanVAE(image_size=16, cfg=vq_cfg)
    cfg = BertConfig(dim=64, num_text_tokens=100, text_seq_len=8,
                     num_visuals=1, num_targets=2, num_image_tokens=1024,
                     image_fmap_size=8, image_size=16,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    return MMVIDBert(cfg, vae)


def test_render_visual_prompt_modes():
    """Occlusion regions match reference utils_train.py:456-520 (NHWC)."""
    rng = np.random.RandomState(0)
    v = rng.uniform(0, 0.5, (1, 2, 128, 128, 3)).astype(np.float32)

    out, fm = render_visual_prompt(v, rand_visual=True)
    assert fm is None
    assert (out[:, :, 64:] == 1.0).all() and (out[:, :, :64] == v[:, :, :64]).all()

    out, fm = render_visual_prompt(v, vc_mode='face_8x8')
    assert fm in ('eyes_nose', 'mouth')
    if fm == 'eyes_nose':
        kept = out[:, :, 32:80, 16:112]
        assert np.array_equal(kept, v[:, :, 32:80, 16:112])
        assert (out[:, :, :32] == 1.0).all()
    else:
        kept = out[:, :, 80:112, 32:96]
        assert np.array_equal(kept, v[:, :, 80:112, 32:96])
        assert (out[:, :, :80] == 1.0).all()

    out, fm = render_visual_prompt(v, vc_mode='face2_8x8')
    assert fm == 'face2'
    assert np.array_equal(out[:, 0], v[:, 0])          # frame 0 untouched
    assert (out[:, 1:, :32] == 1.0).all()
    assert np.array_equal(out[:, 1:, 32:96, 32:96], v[:, 1:, 32:96, 32:96])

    out, fm = render_visual_prompt(v, vc_mode='mask_8x8')
    assert fm == 'mask'
    assert np.array_equal(out[:, :, 16:112, 16:112], v[:, :, 16:112, 16:112])
    assert (out[:, :, :16] == 1.0).all()

    out, fm = render_visual_prompt(v, vc_mode='shape_4x4')
    assert fm == 'shape'
    assert (out[:, :, 32:96, 32:96] == 1.0).all()
    assert np.array_equal(out[:, :, :32], v[:, :, :32])


def test_visualize_train_with_visual_and_debug(tiny_visual_model, tmp_path):
    """Grid rows lead with the (occluded) control frames; --debug writes
    per-step PNAG grids."""
    model = tiny_visual_model
    rng = np.random.RandomState(2)
    b = 2
    batch = {
        'text': rng.randint(1, 100, (b, 8)).astype(np.int32),
        'target': rng.uniform(0, 1, (b, 2, 16, 16, 3)).astype(np.float32),
        'visual': rng.uniform(0, 1, (b, 1, 16, 16, 3)).astype(np.float32),
        'description': ['a', 'b'],
    }
    out = str(tmp_path / 'samples')
    visualize_train(model, batch, jax.random.PRNGKey(0), out, 5,
                    n_per_sample=1, mask_predict_steps=3,
                    mask_predict_steps1=2, vc_mode='face_8x8',
                    counterfactual=True, debug=True)
    files = sorted(os.listdir(out))
    assert '0000005_0.png' in files and '0000005_1.png' in files
    assert '0000005_captions.txt' in files
    pnag = os.path.join(out, '0000005_pnag')
    assert os.path.isdir(pnag)
    assert sorted(os.listdir(pnag)) == ['00.png', '01.png']

    # the grid leads with V control frames: width = (V + T) * W
    from PIL import Image
    img = Image.open(os.path.join(out, '0000005_0.png'))
    assert img.width == (1 + 2) * 16


def test_visualize_train_shapes_counterfactual(tmp_path):
    """test_mode='shapes' renders one per-slot counterfactual row per
    visual-control slot, each swapping ONLY that slot with the loader
    negative (reference utils_train.py:1160-1196, gated at :1030)."""
    vq_cfg = VQGanConfig(resolution=16, ch=32, ch_mult=(1, 2),
                         num_res_blocks=1, z_channels=64, embed_dim=64,
                         n_embed=1024, attn_resolutions=())
    vae = VQGanVAE(image_size=16, cfg=vq_cfg)
    cfg = BertConfig(dim=64, num_text_tokens=100, text_seq_len=8,
                     num_visuals=3, num_targets=2, num_image_tokens=1024,
                     image_fmap_size=8, image_size=16,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    model = MMVIDBert(cfg, vae)
    rng = np.random.RandomState(3)
    b = 2
    batch = {
        'text': rng.randint(1, 100, (b, 8)).astype(np.int32),
        'target': rng.uniform(0, 1, (b, 2, 16, 16, 3)).astype(np.float32),
        'visual': rng.uniform(0, 1, (b, 3, 16, 16, 3)).astype(np.float32),
        'visual_neg': rng.uniform(0, 1, (b, 3, 16, 16, 3)).astype(
            np.float32),
        'description': ['a', 'b'],
    }
    out = str(tmp_path / 'samples')
    visualize_train(model, batch, jax.random.PRNGKey(1), out, 1,
                    n_per_sample=1, mask_predict_steps=2,
                    mask_predict_steps1=2, counterfactual=False,
                    test_mode='shapes')
    from PIL import Image
    img = Image.open(os.path.join(out, '0000001_0.png'))
    # rows: real + recon + 1 generated + 3 per-slot counterfactuals = 6
    # (each row is 16 px + 2 px tile_grid padding)
    assert img.height == 6 * 18
    # each row leads with the 3 control frames then 2 target frames
    assert img.width == (3 + 2) * 16
    arr = np.asarray(img, dtype=np.float32) / 255.0
    # counterfactual row kk shows slot kk swapped to the negative and the
    # other slots unchanged (prompt columns of rows 3..5)
    for kk in range(3):
        row = arr[(3 + kk) * 18:(3 + kk) * 18 + 16]
        for slot in range(3):
            want = (batch['visual_neg'][0, slot] if slot == kk
                    else batch['visual'][0, slot])
            got = row[:, slot * 16:(slot + 1) * 16]
            np.testing.assert_allclose(got, want, atol=2 / 255)

    # without visual_neg in the batch, test_mode='shapes' adds no rows
    out2 = str(tmp_path / 'samples2')
    batch2 = {k: v for k, v in batch.items() if k != 'visual_neg'}
    visualize_train(model, batch2, jax.random.PRNGKey(1), out2, 1,
                    n_per_sample=1, mask_predict_steps=2,
                    mask_predict_steps1=2, counterfactual=False,
                    test_mode='shapes')
    img2 = Image.open(os.path.join(out2, '0000001_0.png'))
    assert img2.height == 3 * 18


def test_interp_real_window_arithmetic():
    """interp_real slides T/2-frame windows with stride T/4, keeps T/2
    output frames per window (last keeps T-1): with a stub sampler that
    interleaves (evens=preserved, odds=marker), level-1 output must be
    [s0, m, s1, m, s2, m, s3] — evens are the source frames, length
    last_tt*T/2 + T - 1 (utils_train.py:1433-1527)."""
    from mmvid_tpu.utils.viz import generate_interp_real_video

    T, n = 4, 64
    b = 1

    class StubModel:
        class cfg:
            num_targets = T
            image_seq_len = n

        class vae:
            @staticmethod
            def decode(seq):
                # [M, n] -> [M, 1, 1, 3] carrying the first token value
                m = seq.shape[0]
                return jnp.broadcast_to(
                    seq[:, :1, None, None].astype(jnp.float32),
                    (m, 1, 1, 3))

        @staticmethod
        def generate_images(k, text, visual=None, mask_predict_steps=0,
                            dynamic=False, preserve=None,
                            long_mode='', mp_config=None, decode=False):
            grid = preserve.reshape(b, T, n)
            out = jnp.zeros((b, T, n), jnp.int32) + 999       # marker odds
            out = out.at[:, ::2].set(grid[:, :T // 2])        # evens = src
            return None, out.reshape(b, -1)

    source = (jnp.arange(4)[None, :, None] * jnp.ones((b, 4, n), jnp.int32)
              ).reshape(b, -1)  # frame f filled with value f
    video = generate_interp_real_video(
        StubModel(), jax.random.PRNGKey(0),
        jnp.ones((b, 6), jnp.int32), source, t_repeat=2)
    assert video.shape == (b, 7, 1, 1, 3)
    vals = video[0, :, 0, 0, 0].astype(int).tolist()
    assert vals == [0, 999, 1, 999, 2, 999, 3], vals


def test_interp_real_end_to_end(tiny_visual_model):
    """Real tiny model: 4 source frames -> 7 frames at t_repeat=2."""
    vq_cfg = VQGanConfig(resolution=16, ch=32, ch_mult=(1, 2),
                         num_res_blocks=1, z_channels=64, embed_dim=64,
                         n_embed=1024, attn_resolutions=())
    vae = VQGanVAE(image_size=16, cfg=vq_cfg)
    cfg = BertConfig(dim=64, num_text_tokens=100, text_seq_len=8,
                     num_visuals=0, num_targets=4, num_image_tokens=1024,
                     image_fmap_size=8, image_size=16,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    model = MMVIDBert(cfg, vae)
    from mmvid_tpu.utils.viz import generate_interp_real_video
    rng = np.random.RandomState(0)
    source = jnp.asarray(rng.randint(0, 1024, (1, 4 * 64)), jnp.int32)
    video = generate_interp_real_video(
        model, jax.random.PRNGKey(1), jnp.ones((1, 8), jnp.int32), source,
        t_repeat=2, mask_predict_steps=2)
    assert video.shape == (1, 7, 16, 16, 3)
    assert 0.0 <= video.min() and video.max() <= 1.0
