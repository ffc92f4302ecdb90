"""Stochastic masking & token-space corruption, jit-compatible.

Parity targets (distributional, not RNG-exact — the reference uses host
numpy/torchvision RNG, dalle_bert.py:992-1029, 779-848):

* MSM masking strategies 1-4 + preservation control (dalle_bert.py:985-1029)
* random_erase_codebook — visual-control random-box erase / bottom-half
  erase with the [MASK] fill value (dalle_bert.py:779-794)
* erase_codebook_face — hardcoded face/mask/shape region patterns
  (dalle_bert.py:796-848)

All functions take explicit jax.random keys and static config, and lower to
fixed-shape masked ops so the whole training step stays inside one jit.

Known deviation: torchvision.RandomErasing retries box sampling up to 10x
and no-ops on failure; we sample once and clamp the box inside the grid
(always erases).  With the configured scale/ratio ranges the retry path is
almost never taken, and this only shifts a training-time augmentation
distribution by a hair.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mmvid_tpu.models.bert import BertConfig


def _random_box_mask(key, t: int, h: int, w: int, scale: Tuple[float, float],
                     ratio: Tuple[float, float]) -> jax.Array:
    """[t, h, w] bool mask, True inside one random box shared across t."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w
    erase_area = area * jax.random.uniform(k1, minval=scale[0],
                                           maxval=scale[1])
    log_ratio = jax.random.uniform(k2, minval=jnp.log(ratio[0]),
                                   maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    bh = jnp.clip(jnp.round(jnp.sqrt(erase_area * aspect)), 1, h).astype(
        jnp.int32)
    bw = jnp.clip(jnp.round(jnp.sqrt(erase_area / aspect)), 1, w).astype(
        jnp.int32)
    i0 = jax.random.randint(k3, (), 0, jnp.maximum(h - bh + 1, 1))
    j0 = jax.random.randint(k4, (), 0, jnp.maximum(w - bw + 1, 1))
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    box = ((rows >= i0) & (rows < i0 + bh)
           & (cols >= j0) & (cols < j0 + bw))
    return jnp.broadcast_to(box[None], (t, h, w))


def sample_msm_mask(key, cfg: BertConfig, msm_strategy_prob,
                    msm_bernoulli_prob=(0.2, 0.5), pc_prob: float = 0.0,
                    batch: int = 1):
    """Sample per-sample keep-GT masks (reference mask1, dalle_bert.py:992-1029).

    Returns (keep_mask [B, target_seq_len] bool — True keeps the GT token
    visible, False replaces it with [MASK]; not_fully_masked [B] float).
    """
    t, h = cfg.num_targets, cfg.image_fmap_size
    n = cfg.target_seq_len
    probs = jnp.asarray(msm_strategy_prob, jnp.float32)

    def per_sample(k):
        ks = jax.random.split(k, 6)
        strategy = jax.random.choice(ks[0], 4, p=probs)

        # (1) Bernoulli keep with p ~ U(lo, hi)
        p_keep = jax.random.uniform(ks[1], minval=msm_bernoulli_prob[0],
                                    maxval=msm_bernoulli_prob[1])
        m1 = jax.random.bernoulli(ks[2], p_keep, (n,))
        # (2) mask everything
        m2 = jnp.zeros((n,), bool)
        # (3) keep outside a random box / (4) keep only inside it
        box = _random_box_mask(ks[3], t, h, h,
                               scale=(0.2, 0.8), ratio=(0.5, 2.0)
                               ).reshape(n)
        m3 = ~box
        m4 = box

        # NB: jnp.select promotes bool choices to int32; force bool — the
        # loss weights use `~keep`, which is bitwise NOT on ints.
        keep = jnp.select(
            [strategy == 0, strategy == 1, strategy == 2, strategy == 3],
            [m1, m2, m3, m4]).astype(bool)
        nfm = jnp.where(strategy == 1, 0.0, 1.0)

        # preservation control: force-keep t_overlap random whole frames
        # (dalle_bert.py:1022-1026); enables long-video extrapolation.
        if pc_prob > 0:
            use_pc = jax.random.uniform(ks[4]) < pc_prob
            t_overlap = jax.random.randint(ks[5], (), 1,
                                           max(t // 2, 1) + 1)
            order = jax.random.permutation(ks[4], t)
            frame_keep = (jnp.argsort(order) < t_overlap)  # t_overlap frames
            frame_keep = jnp.repeat(frame_keep, cfg.image_seq_len)
            keep = jnp.where(use_pc, keep | frame_keep, keep)
        return keep, nfm

    keys = jax.random.split(key, batch)
    keep, nfm = jax.vmap(per_sample)(keys)
    return keep, nfm


def random_erase_codebook(key, visual_tokens, cfg: BertConfig,
                          erase_half: bool = False, p: float = 0.95):
    """Visual-control token erase (dalle_bert.py:779-794).

    visual_tokens [B, V*n] (no SEP); erase_half fills the bottom half of
    every frame grid with [MASK]; otherwise one random box per sample with
    torchvision params p=0.95, scale=(0.55,0.85), ratio=(0.5,2).
    """
    b = visual_tokens.shape[0]
    v = cfg.num_visuals
    h = cfg.image_fmap_size
    grid = visual_tokens.reshape(b, v, h, h)
    if erase_half:
        out = grid.at[:, :, h // 2:, :].set(cfg.mask_token)
        return out.reshape(b, -1)

    def per_sample(k, g):
        k1, k2 = jax.random.split(k)
        box = _random_box_mask(k1, v, h, h, scale=(0.55, 0.85),
                               ratio=(0.5, 2.0))
        do = jax.random.uniform(k2) < p
        return jnp.where(do & box, cfg.mask_token, g)

    keys = jax.random.split(key, b)
    out = jax.vmap(per_sample)(keys, grid)
    return out.reshape(b, -1)


def erase_codebook_face(key, visual_tokens, cfg: BertConfig, vc_mode: str,
                        face_mode: str | None = None):
    """Structured visual-control occlusion per vc_mode (dalle_bert.py:796-848).

    Token-grid patterns are hardcoded for the 8x8 (and 4x4) fmaps exactly as
    the reference.
    """
    b = visual_tokens.shape[0]
    v = cfg.num_visuals
    h = cfg.image_fmap_size
    grid = visual_tokens.reshape(b, v, h, h)
    mask_tok = cfg.mask_token
    full_mask = jnp.full_like(grid, mask_tok)

    if vc_mode == 'face_8x8':
        eyes = full_mask.at[:, :, 2:5, 1:7].set(grid[:, :, 2:5, 1:7])
        mouth = full_mask.at[:, :, 5:7, 2:6].set(grid[:, :, 5:7, 2:6])
        if face_mode is None:
            use_eyes = jax.random.uniform(key) < 0.5
            out = jnp.where(use_eyes, eyes, mouth)
        else:
            out = eyes if face_mode == 'eyes_nose' else mouth
    elif vc_mode == 'face2_8x8':  # appearance frame 0 + center motion crop
        out = full_mask.at[:, 0].set(grid[:, 0])
        out = out.at[:, 1:, 2:6, 2:6].set(grid[:, 1:, 2:6, 2:6])
    elif vc_mode == 'face3_8x8':
        out = full_mask.at[:, 0].set(grid[:, 0])
        out = out.at[:, :, 2:6, 2:6].set(grid[:, :, 2:6, 2:6])
    elif vc_mode in ('mask_8x8', 'mask2_8x8'):
        keep_all = grid
        center = full_mask.at[:, :, 2:6, 2:6].set(grid[:, :, 2:6, 2:6])
        wide = full_mask.at[:, :, 1:7, 1:7].set(grid[:, :, 1:7, 1:7])
        if face_mode is None:
            s = jax.random.choice(key, 3,
                                  p=jnp.array([0.5, 0.25, 0.25]))
            out = jnp.select([s == 0, s == 1, s == 2],
                             [keep_all, center, wide])
        else:
            out = wide
    elif vc_mode == 'shape_4x4':
        out = grid.at[:, :, 1:3, 1:3].set(mask_tok)
    else:
        raise NotImplementedError(vc_mode)
    return out.reshape(b, -1)
