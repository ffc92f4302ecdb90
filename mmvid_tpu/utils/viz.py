"""Sample visualization (reference utils/utils_train.py:391-1654).

Writes per-sample grids (real / reconstruction / N generated variants /
counterfactual-control samples) as PNGs + caption txt and optional HTML/GIF
rows, and implements the three long-video generation modes:

* ``long``   — sliding-window extrapolation preserving the last t_overlap
  frames' tokens per chunk (utils_train.py:1337-1373)
* ``interp`` — hierarchical binary interpolation, alternate frames preserved,
  doubling length per level (utils_train.py:1374-1431)
* ``interp_real`` — interpolate a real video's tokens (:1433-1527)
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmvid_tpu.utils.html import (
    HTML,
    save_image_array,
    tile_grid,
    tile_video_row,
)


def _cap_file(path: str, lines):
    with open(path, 'w') as f:
        f.write('\n'.join(lines))


def visualize_train(model, batch: Dict, key, out_dir: str, iteration: int,
                    *, n_per_sample: int = 2, mask_predict_steps=0,
                    mask_predict_steps1: int = 0, vc_mode=None,
                    counterfactual: bool = False,
                    webpage: Optional[HTML] = None, mp_config=None):
    """Real / recon / generated (/counterfactual-control) grids
    (reference visualize_train/visualize_test, utils_train.py:391-1217).

    mask_predict_steps may be an int or a list — like the reference's
    --mask_predict_steps 10 20 30, each generated row cycles through the
    list.  counterfactual=True adds a row conditioned on the NEIGHBOUR
    sample's visual control (batch roll) sampled with mask_predict_steps1.
    """
    os.makedirs(out_dir, exist_ok=True)
    text = jnp.asarray(batch['text'])
    target = jnp.asarray(batch['target'])
    visual = (jnp.asarray(batch['visual'])
              if batch.get('visual') is not None
              and model.cfg.num_visuals > 0 else None)

    steps_list = (list(mask_predict_steps)
                  if isinstance(mask_predict_steps, (list, tuple))
                  else [mask_predict_steps])

    rows = []
    captions = batch.get('description',
                         [''] * text.shape[0])

    recon = model.recon_images(target)
    for j in range(n_per_sample):
        key, k = jax.random.split(key)
        videos, _ = model.generate_images(
            k, text, visual=visual, vc_mode=vc_mode,
            mask_predict_steps=steps_list[j % len(steps_list)],
            dynamic=True, mp_config=mp_config)
        rows.append(np.asarray(videos))

    if counterfactual and visual is not None:
        # counterfactual: the NEIGHBOUR sample's control
        key, k = jax.random.split(key)
        videos, _ = model.generate_images(
            k, text, visual=jnp.roll(visual, 1, axis=0), vc_mode=vc_mode,
            mask_predict_steps=mask_predict_steps1, dynamic=True,
            mp_config=mp_config)
        rows.append(np.asarray(videos))
        # free-form: no visual control at all (fully-masked visual row,
        # reference visualize_test's "free" samples)
        key, k = jax.random.split(key)
        videos, _ = model.generate_images(
            k, text, visual=None,
            mask_predict_steps=mask_predict_steps1, dynamic=True,
            mp_config=mp_config)
        rows.append(np.asarray(videos))

    for i in range(text.shape[0]):
        grid_rows = [tile_video_row(np.asarray(target[i]))]
        grid_rows.append(tile_video_row(np.asarray(recon[i])))
        for r in rows:
            grid_rows.append(tile_video_row(r[i]))
        grid = tile_grid(grid_rows)
        save_image_array(
            os.path.join(out_dir, f'{iteration:07d}_{i}.png'), grid)
        if webpage is not None:
            name = webpage.save_media(f'{iteration:07d}_{i}.gif', rows[0][i])
            webpage.add_media_row([(name, captions[i])])
    _cap_file(os.path.join(out_dir, f'{iteration:07d}_captions.txt'),
              list(captions))
    if webpage is not None:
        webpage.add_header(f'iteration {iteration}')
        webpage.save()


def generate_long_video(model, key, text, visual=None, *, t_repeat: int = 10,
                        t_overlap: int = 1, mask_predict_steps: int = 0,
                        mp_config=None, vc_mode=None):
    """Sliding-window extrapolation (utils_train.py:1337-1373): each chunk
    preserves the previous chunk's last t_overlap frames' tokens and appends
    the novel tail.  Returns [B, total_frames, H, W, 3]."""
    cfg = model.cfg
    n_tok = cfg.image_seq_len
    videos, seq = model.generate_images(
        key, text, visual=visual, vc_mode=vc_mode,
        mask_predict_steps=mask_predict_steps, dynamic=False,
        mp_config=mp_config)
    chunks = [np.asarray(videos)]
    for rep in range(1, t_repeat):
        key, k = jax.random.split(key)
        videos, seq = model.generate_images(
            k, text, visual=visual, vc_mode=vc_mode,
            mask_predict_steps=mask_predict_steps, dynamic=False,
            preserve=seq, t_overlap=t_overlap, long_mode='long',
            mp_config=mp_config)
        chunks.append(np.asarray(videos)[:, t_overlap:])
    return np.concatenate(chunks, axis=1)


def generate_interpolated_video(model, key, text, visual=None, *,
                                levels: int = 1, source_tokens=None,
                                mask_predict_steps: int = 0, mp_config=None):
    """Hierarchical binary interpolation (utils_train.py:1374-1431):
    each level doubles temporal density — the source frames are preserved
    at the even slots of a num_targets-frame window and the odd slots are
    re-sampled.  ``source_tokens`` seeds interp_real (:1433-1527).
    Returns [B, S * 2^levels frames, H, W, 3]."""
    cfg = model.cfg
    t = cfg.num_targets
    n_tok = cfg.image_seq_len
    b = text.shape[0]
    if source_tokens is None:
        key, k = jax.random.split(key)
        _, seq = model.generate_images(
            k, text, visual=visual, mask_predict_steps=mask_predict_steps,
            dynamic=False, mp_config=mp_config, decode=False)
    else:
        seq = jnp.asarray(source_tokens)

    for _ in range(levels):
        s = seq.shape[1] // n_tok           # current frame count
        assert s % (t // 2) == 0, (
            f'interp needs frame count {s} divisible by num_targets/2')
        grid = seq.reshape(b, s, n_tok)
        windows = []
        for w in range(s // (t // 2)):
            src = grid[:, w * (t // 2):(w + 1) * (t // 2)]
            # the preserve layout reads the FIRST T/2 frames of the buffer
            # and pins them at even slots (sampler.arrange_preserve_tokens)
            src_full = jnp.concatenate(
                [src, jnp.zeros_like(src)], axis=1).reshape(b, -1)
            key, k = jax.random.split(key)
            _, out = model.generate_images(
                k, text, visual=visual,
                mask_predict_steps=mask_predict_steps, dynamic=False,
                preserve=src_full, long_mode='interp',
                mp_config=mp_config, decode=False)
            windows.append(out)
        seq = jnp.concatenate(windows, axis=1)

    total = seq.shape[1] // n_tok
    frames = model.decode_video(seq.reshape(b * (total // t), t * n_tok))
    frames = np.asarray(frames).reshape((b, total) + frames.shape[2:])
    return frames


def visualize_long(model, batch: Dict, key, out_dir: str, *,
                   long_mode: str = 'long', t_repeat: int = 10,
                   t_overlap: int = 1, mask_predict_steps: int = 0,
                   mp_config=None, webpage: Optional[HTML] = None):
    """Driver for the three long-video modes (utils_train.py:1220-1654)."""
    os.makedirs(out_dir, exist_ok=True)
    text = jnp.asarray(batch['text'])
    visual = (jnp.asarray(batch['visual'])
              if batch.get('visual') is not None
              and model.cfg.num_visuals > 0 else None)

    if long_mode == 'long':
        video = generate_long_video(
            model, key, text, visual, t_repeat=t_repeat,
            t_overlap=t_overlap, mask_predict_steps=mask_predict_steps,
            mp_config=mp_config)
    elif long_mode in ('interp', 'interp_real'):
        source = None
        if long_mode == 'interp_real':
            source = model.get_image_tokens(jnp.asarray(batch['target']))
        video = generate_interpolated_video(
            model, key, text, visual, source_tokens=source,
            mask_predict_steps=mask_predict_steps, mp_config=mp_config)
    else:
        raise NotImplementedError(long_mode)

    for i in range(video.shape[0]):
        save_image_array(os.path.join(out_dir, f'long_{i}.png'),
                         tile_video_row(video[i]))
        if webpage is not None:
            name = webpage.save_media(f'long_{i}.gif', video[i])
            webpage.add_media_row(
                [(name, batch.get('description', [''] * len(video))[i])])
    if webpage is not None:
        webpage.save()
    return video
