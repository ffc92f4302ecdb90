"""Distributional checks on the MSM masking strategies and token erasers
(reference dalle_bert.py:992-1029, 779-848)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.bert import BertConfig
from mmvid_tpu.models.clip import ClipStackConfig
from mmvid_tpu.models.masking import (
    erase_codebook_face,
    random_erase_codebook,
    sample_msm_mask,
)

pytestmark = pytest.mark.quick

CFG = BertConfig(dim=64, num_text_tokens=100, text_seq_len=8,
                 num_visuals=2, num_targets=8, num_image_tokens=1024,
                 image_fmap_size=8, image_size=128,
                 clip=ClipStackConfig(width=64, layers=2, heads=2))


def _keeps(strategy_probs, n=256, pc_prob=0.0,
           bernoulli=(0.2, 0.5)):
    keep, nfm = sample_msm_mask(jax.random.PRNGKey(0), CFG, strategy_probs,
                                bernoulli, pc_prob, batch=n)
    return np.asarray(keep), np.asarray(nfm)


def test_strategy1_bernoulli_keep_rate():
    keep, nfm = _keeps((1.0, 0.0, 0.0, 0.0))
    rates = keep.mean(axis=1)
    # per-sample keep prob ~ U(0.2, 0.5); mean over samples ~0.35
    assert 0.3 < rates.mean() < 0.4
    assert rates.min() > 0.1 and rates.max() < 0.6
    assert (nfm == 1.0).all()


def test_strategy2_masks_everything():
    keep, nfm = _keeps((0.0, 1.0, 0.0, 0.0))
    assert not keep.any()
    assert (nfm == 0.0).all()


def test_strategies_3_4_are_box_complements():
    keep3, _ = _keeps((0.0, 0.0, 1.0, 0.0), n=64)
    keep4, _ = _keeps((0.0, 0.0, 0.0, 1.0), n=64)
    # strategy 3 keeps OUTSIDE a 0.2-0.8-area box; 4 keeps only inside
    r3 = keep3.mean(axis=1)
    r4 = keep4.mean(axis=1)
    assert 0.2 <= 1 - r3.mean() <= 0.8 and 0.2 <= r4.mean() <= 0.8
    # the box is shared across frames: per-frame keep maps identical
    g = keep3[0].reshape(8, 64)
    assert (g == g[0]).all()


def test_preservation_control_keeps_whole_frames():
    keep, _ = _keeps((0.0, 1.0, 0.0, 0.0), n=128, pc_prob=1.0)
    # strategy 2 masks all; pc forces 1..T/2 whole frames kept
    per_frame = keep.reshape(-1, 8, 64).all(axis=2)     # fully-kept frames
    partial = keep.reshape(-1, 8, 64).any(axis=2) & ~per_frame
    assert not partial.any()                            # whole frames only
    counts = per_frame.sum(axis=1)
    assert counts.min() >= 1 and counts.max() <= 4


def test_random_erase_codebook_half():
    toks = jnp.arange(2 * CFG.visual_seq_len).reshape(
        2, -1).astype(jnp.int32) % 1024
    out = np.asarray(random_erase_codebook(
        jax.random.PRNGKey(0), toks, CFG, erase_half=True))
    grid = out.reshape(2, 2, 8, 8)
    assert (grid[:, :, 4:, :] == CFG.mask_token).all()
    assert (grid[:, :, :4, :] != CFG.mask_token).all()


def test_erase_codebook_face_modes():
    toks = jnp.zeros((2, CFG.visual_seq_len), jnp.int32)
    out = np.asarray(erase_codebook_face(
        jax.random.PRNGKey(0), toks, CFG, 'face_8x8', face_mode='mouth'))
    grid = out.reshape(2, 2, 8, 8)
    assert (grid[:, :, 5:7, 2:6] == 0).all()            # mouth kept
    mask = np.ones((8, 8), bool)
    mask[5:7, 2:6] = False
    assert (grid[0, 0][mask] == CFG.mask_token).all()   # rest masked

    out2 = np.asarray(erase_codebook_face(
        jax.random.PRNGKey(0), toks, CFG, 'face2_8x8'))
    g2 = out2.reshape(2, 2, 8, 8)
    assert (g2[:, 0] == 0).all()                        # appearance frame
    assert (g2[:, 1, 2:6, 2:6] == 0).all()              # motion crop
    assert (g2[:, 1, 0, 0] == CFG.mask_token).all()
