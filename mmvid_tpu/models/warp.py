"""Pixel-space video warps — negatives for the VID (temporal-consistency)
head, jit-compatible.

Parity target (distributional): mmvid_pytorch/dalle_bert.py:125-238
(`warp`, `warp_with_color`, `warp_with_affine`, `warp_video_with_color`).
Four per-sample strategies chosen by vid_strategy_prob:
  0: replace one frame with a frame from another batch element
  1: shuffle frames (non-identity permutation)
  2: additive color shift on one frame (all channels or one)
  3: affine warp of one frame (rotation, translation, scale; reflection pad)

Everything is computed for all strategies and selected per sample with
`jnp.where`, so the op stays fixed-shape inside jit.  Videos are NHWC
[B, T, H, W, 3] in [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _affine_warp_frame(key, frame, angle_deg=30.0, trans=0.1, scale=0.05):
    """Rotate/translate/scale one frame, bilinear, reflection padding
    (dalle_bert.py:179-201; called with (30, 0.1, 0.1) at :233)."""
    h, w, _ = frame.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    angle = jnp.deg2rad(jax.random.uniform(k1, minval=-angle_deg,
                                           maxval=angle_deg))
    tx = jax.random.uniform(k2, minval=-trans, maxval=trans)
    ty = jax.random.uniform(k3, minval=-trans, maxval=trans)
    s = jax.random.uniform(k4, minval=1.0 - scale, maxval=1.0 + scale)

    # torch affine_grid convention: output normalized coords u,v in [-1,1];
    # input coords = theta @ [u, v, 1].
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    us = (jnp.arange(w) + 0.5) / w * 2.0 - 1.0
    vs = (jnp.arange(h) + 0.5) / h * 2.0 - 1.0
    u, v = jnp.meshgrid(us, vs)
    x_in = s * cos * u - s * sin * v + tx
    y_in = s * sin * u + s * cos * v + ty
    # to pixel coords
    px = (x_in + 1.0) * 0.5 * w - 0.5
    py = (y_in + 1.0) * 0.5 * h - 0.5

    def sample_channel(c):
        return jax.scipy.ndimage.map_coordinates(
            c, [py.reshape(-1), px.reshape(-1)], order=1, mode='reflect'
        ).reshape(h, w)

    return jnp.stack([sample_channel(frame[..., i]) for i in range(3)],
                     axis=-1)


def _color_shift_frame(key, frame):
    """Additive shift on all / R / G / B channels (dalle_bert.py:161-176)."""
    k1, k2 = jax.random.split(key)
    c_shift = jax.random.uniform(k1) - 0.5
    which = jax.random.randint(k2, (), 0, 4)
    shift_all = jnp.full((3,), c_shift)
    shifts = [shift_all] + [jnp.zeros((3,)).at[i].set(c_shift)
                            for i in range(3)]
    shift = jnp.select([which == i for i in range(4)], shifts)
    return jnp.clip(frame + shift[None, None, :], 0.0, 1.0)


def warp_video_with_color(key, video):
    """Per-sample color shift on a whole video [B,T,H,W,3]
    (dalle_bert.py:140-158; used by visual_aug_mode='motion_color')."""
    def per_sample(k, x):
        return _color_shift_frame(k, x)  # broadcast over leading T
    keys = jax.random.split(key, video.shape[0])
    return jax.vmap(per_sample)(keys, video)


def warp(key, video, vid_strategy_prob=(0.25, 0.25, 0.25, 0.25)):
    """VID negatives (dalle_bert.py:204-238). video [B,T,H,W,3] in [0,1]."""
    b, t = video.shape[0], video.shape[1]
    probs = jnp.asarray(vid_strategy_prob, jnp.float32)
    keys = jax.random.split(key, b)

    def per_sample(i, k, x):
        ks = jax.random.split(k, 6)
        strategy = jax.random.choice(ks[0], 4, p=probs)
        j1 = jax.random.randint(ks[1], (), 0, t)
        j2 = jax.random.randint(ks[2], (), 0, t)

        # 0: steal frame j2 from another sequence
        off = jax.random.randint(ks[3], (), 1, max(b, 2))
        i_other = (i + off) % b
        stolen = video[i_other, j2]
        y0 = x.at[j1].set(stolen)

        # 1: shuffle frames (fall back to roll if the perm is identity)
        perm = jax.random.permutation(ks[4], t)
        perm = jax.lax.cond(jnp.all(perm == jnp.arange(t)),
                            lambda p: jnp.roll(p, 1), lambda p: p, perm)
        y1 = x[perm]

        # 2: color-shift frame j1
        y2 = x.at[j1].set(_color_shift_frame(ks[5], x[j1]))

        # 3: affine-warp frame j1
        y3 = x.at[j1].set(_affine_warp_frame(ks[5], x[j1],
                                             angle_deg=30.0, trans=0.1,
                                             scale=0.1))

        return jnp.select(
            [strategy == 0, strategy == 1, strategy == 2, strategy == 3],
            [y0, y1, y2, y3])

    return jax.vmap(per_sample, in_axes=(0, 0, 0))(
        jnp.arange(b), keys, video)


def warp_token_plan(key, video, vid_strategy_prob=(0.25, 0.25, 0.25, 0.25)):
    """Token-level form of :func:`warp`: VQGAN encoding is per-frame, so
    strategies 0 (steal a frame) and 1 (shuffle frames) are pure frame
    permutations of the ALREADY-encoded target tokens, and strategies 2/3
    modify exactly ONE frame — only that frame needs a fresh encode.
    Applying the plan with :func:`apply_warp_token_plan` is bitwise
    identical to ``get_image_tokens(warp(key, video))`` for the same key
    (same split structure and draw order), at 1/T of the encoder work —
    the VID branch's per-step re-encode drops from B*T to B frames.

    Returns (mod_frame [B,H,W,3] pixels — frame j1 with the strategy-2/3
    pixel modification applied (untouched for 0/1; encoded but unused),
    plan dict of per-sample indices).
    """
    b, t = video.shape[0], video.shape[1]
    probs = jnp.asarray(vid_strategy_prob, jnp.float32)
    keys = jax.random.split(key, b)

    def per_sample(i, k, x):
        ks = jax.random.split(k, 6)
        strategy = jax.random.choice(ks[0], 4, p=probs)
        j1 = jax.random.randint(ks[1], (), 0, t)
        j2 = jax.random.randint(ks[2], (), 0, t)
        off = jax.random.randint(ks[3], (), 1, max(b, 2))
        i_other = (i + off) % b
        perm = jax.random.permutation(ks[4], t)
        perm = jax.lax.cond(jnp.all(perm == jnp.arange(t)),
                            lambda p: jnp.roll(p, 1), lambda p: p, perm)
        frame = x[j1]
        mod = jnp.where(strategy == 3,
                        _affine_warp_frame(ks[5], frame, angle_deg=30.0,
                                           trans=0.1, scale=0.1),
                        _color_shift_frame(ks[5], frame))
        return mod, strategy, j1, j2, i_other, perm

    mod, strategy, j1, j2, i_other, perm = jax.vmap(
        per_sample, in_axes=(0, 0, 0))(jnp.arange(b), keys, video)
    return mod, {'strategy': strategy, 'j1': j1, 'j2': j2,
                 'i_other': i_other, 'perm': perm}


def apply_warp_token_plan(target_tokens, mod_tokens, plan):
    """Assemble the warped token sequence from the plan.

    target_tokens [B, T*n] (the MSM branch's already-encoded targets),
    mod_tokens [B, n] (encode of the plan's mod_frame).
    Returns [B, T*n] equal to ``get_image_tokens(warp(...))``."""
    b, total = target_tokens.shape
    t = plan['perm'].shape[1]
    n = total // t
    grid = target_tokens.reshape(b, t, n)

    def per_sample(i, g):
        s = plan['strategy'][i]
        y0 = g.at[plan['j1'][i]].set(grid[plan['i_other'][i],
                                          plan['j2'][i]])
        y1 = g[plan['perm'][i]]
        y23 = g.at[plan['j1'][i]].set(mod_tokens[i])
        return jnp.select([s == 0, s == 1, s >= 2], [y0, y1, y23])

    out = jax.vmap(per_sample)(jnp.arange(b), grid)
    return out.reshape(b, total)
