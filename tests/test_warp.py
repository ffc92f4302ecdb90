"""VID warp negatives: per-strategy structural properties
(reference dalle_bert.py:125-238)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.warp import (
    _affine_warp_frame,
    _color_shift_frame,
    warp,
    warp_video_with_color,
)

pytestmark = pytest.mark.quick


def _video(b=4, t=4, s=8):
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.uniform(0.2, 0.8, (b, t, s, s, 3)), jnp.float32)


def test_warp_strategy_swap_frame():
    v = _video()
    out = np.asarray(warp(jax.random.PRNGKey(0), v, (1, 0, 0, 0)))
    v = np.asarray(v)
    for i in range(v.shape[0]):
        diff = np.abs(out[i] - v[i]).reshape(v.shape[1], -1).max(axis=1)
        changed = (diff > 1e-6).sum()
        assert changed <= 1  # exactly one frame replaced (or j1 self-noop)
        # the replacement comes from ANOTHER sequence
        for j in np.where(diff > 1e-6)[0]:
            src = np.abs(v - out[i, j][None, None]).reshape(
                v.shape[0], v.shape[1], -1).max(axis=2)
            srcs = np.argwhere(src < 1e-6)
            assert len(srcs) >= 1 and all(s[0] != i for s in srcs)


def test_warp_strategy_shuffle():
    v = _video()
    out = np.asarray(warp(jax.random.PRNGKey(1), v, (0, 1, 0, 0)))
    v = np.asarray(v)
    for i in range(v.shape[0]):
        # same frames as a multiset, different order
        flat_in = {v[i, j].tobytes() for j in range(v.shape[1])}
        flat_out = {out[i, j].tobytes() for j in range(v.shape[1])}
        assert flat_in == flat_out
        assert any(not np.array_equal(out[i, j], v[i, j])
                   for j in range(v.shape[1]))  # non-identity


def test_warp_strategy_color():
    v = _video()
    out = np.asarray(warp(jax.random.PRNGKey(2), v, (0, 0, 1, 0)))
    v = np.asarray(v)
    for i in range(v.shape[0]):
        diff = np.abs(out[i] - v[i]).reshape(v.shape[1], -1).max(axis=1)
        changed = np.where(diff > 1e-6)[0]
        assert len(changed) <= 1
        assert out[i].min() >= 0.0 and out[i].max() <= 1.0


def test_warp_strategy_affine():
    v = _video()
    out = np.asarray(warp(jax.random.PRNGKey(3), v, (0, 0, 0, 1)))
    v = np.asarray(v)
    for i in range(v.shape[0]):
        diff = np.abs(out[i] - v[i]).reshape(v.shape[1], -1).max(axis=1)
        assert (diff > 1e-6).sum() <= 1  # one frame geometrically warped


def test_affine_identity_limit():
    """Zero rotation/translation/scale-jitter leaves the frame ~unchanged."""
    frame = jnp.asarray(np.random.RandomState(1).uniform(
        0, 1, (16, 16, 3)), jnp.float32)
    out = _affine_warp_frame(jax.random.PRNGKey(0), frame, angle_deg=0.0,
                             trans=0.0, scale=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(frame),
                               atol=1e-4)


def test_color_shift_bounds_and_channels():
    frame = jnp.full((8, 8, 3), 0.5)
    shifted = np.asarray(_color_shift_frame(jax.random.PRNGKey(5), frame))
    assert shifted.min() >= 0.0 and shifted.max() <= 1.0
    per_channel = np.unique(shifted.reshape(-1, 3), axis=0)
    assert per_channel.shape[0] == 1  # uniform shift within the frame


def test_warp_video_with_color_per_sample():
    v = _video(b=3, t=2)
    out = np.asarray(warp_video_with_color(jax.random.PRNGKey(6), v))
    assert out.shape == v.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    # all frames of one sample get the SAME shift (outside clipped pixels)
    d = out - np.asarray(v)
    inside = (out > 1e-6) & (out < 1 - 1e-6)
    for i in range(3):
        m = inside[i, 0] & inside[i, 1]
        if m.any():
            np.testing.assert_allclose(d[i, 0][m], d[i, 1][m], atol=1e-6)


def test_warp_token_plan_matches_pixel_warp():
    """The token-level plan (encode ONE frame per sample) must reproduce
    get_image_tokens(warp(...)) bitwise for the same key — same split
    structure, same draw order, per-frame-independent encoder."""
    from mmvid_tpu.models.vqgan import VQGanConfig, VQGanVAE
    from mmvid_tpu.models.warp import apply_warp_token_plan, warp_token_plan

    vq = VQGanConfig(resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     z_channels=64, embed_dim=64, n_embed=256,
                     attn_resolutions=())
    vae = VQGanVAE(image_size=16, cfg=vq)
    rng = np.random.RandomState(3)
    video = jnp.asarray(rng.uniform(0, 1, (4, 3, 16, 16, 3)), jnp.float32)
    b, t = 4, 3
    n = vae.image_seq_len

    def encode(frames):     # [B, T, H, W, 3] -> [B, T*n]
        bb, tt = frames.shape[:2]
        toks = vae.get_codebook_indices(
            frames.reshape((bb * tt,) + frames.shape[2:]))
        return toks.reshape(bb, tt * n)

    for seed in (0, 1, 7):
        key = jax.random.PRNGKey(seed)
        ref = np.asarray(encode(warp(key, video)))
        target_tokens = encode(video)
        mod_frame, plan = warp_token_plan(key, video)
        mod_tokens = vae.get_codebook_indices(mod_frame)
        got = np.asarray(apply_warp_token_plan(
            target_tokens, mod_tokens.reshape(b, n), plan))
        np.testing.assert_array_equal(got, ref, err_msg=f'seed {seed}')
