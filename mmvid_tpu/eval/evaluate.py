"""Quantitative evaluation orchestration (reference utils/utils_eval.py).

``evaluate``: loop eval_num/batch batches, sample videos, ping-pong-extend to
15/16 frames, I3D-embed real & fake, save real/fake_embs.npy, report FVD +
PRD scores to txt/pkl (utils_eval.py:31-219).

``evaluate_clip``: per-frame CLIP similarity, max over frames, mean±std
(utils_eval.py:226-323; the reference's code path is broken as shipped — it
calls a nonexistent ``generate_images_debug`` at :297 — fixed here by using
the normal generation API).
"""

from __future__ import annotations

import os
import pickle
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmvid_tpu.eval.fvd import (
    frechet_distance,
    preprocess_videos,
)
from mmvid_tpu.eval import prd as prd_mod


def evaluate(args, model, dl_iter, i3d_variables=None, key=None,
             metrics=('fvd', 'prd')):
    """Returns {'fvd': float, 'prd': (F8, F1/8)} and writes artifacts to
    args.log_metric_dir."""
    from mmvid_tpu.eval.i3d import I3D

    out_dir = Path(getattr(args, 'log_metric_dir', 'metrics'))
    out_dir.mkdir(parents=True, exist_ok=True)
    key = key if key is not None else jax.random.PRNGKey(args.seed)

    video_length = 15 if args.num_targets < 16 else 16
    total = args.eval_num
    batch = args.batch_size

    i3d = I3D()
    if i3d_variables is None:
        # A random-weight I3D produces MEANINGLESS FVD/PRD numbers; refuse
        # unless the caller explicitly opts in (pipeline tests), so nobody
        # mistakes a smoke run for a measurement.
        if not (getattr(args, 'allow_random_i3d', False)
                or os.environ.get('MMVID_ALLOW_RANDOM_I3D')):
            raise RuntimeError(
                'No I3D weights: set I3D_CHECKPOINT=<converted kinetics '
                'checkpoint> (see mmvid_tpu.eval.i3d.load_i3d_checkpoint) '
                'to compute a real FVD, or set MMVID_ALLOW_RANDOM_I3D=1 '
                'to run the pipeline with random weights (numbers NOT '
                'comparable to the reference).')
        import warnings
        warnings.warn('evaluate(): running with RANDOM I3D weights — '
                      'FVD/PRD numbers are not comparable to the reference.',
                      stacklevel=2)
        i3d_variables = i3d.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, video_length, 224, 224, 3)))

    # TPU-first: the ping-pong extension is a static frame-index gather, so
    # extension + I3D embedding run in ONE device program and the generated
    # videos NEVER visit the host (the reference round-trips every batch
    # through numpy + a TF1 session, utils_eval.py:177-191) — only the
    # [B, 400] embeddings come back.  Indices depend on the SOURCE clip
    # length (real clips have frame_num frames, generated ones
    # num_targets — independent flags), so the embed program is built per
    # length, like the per-clip v.shape[0] of the host-numpy path.
    from functools import lru_cache

    from mmvid_tpu.eval.fvd import pingpong_indices

    @lru_cache(maxsize=None)
    def embed_for_len(t: int):
        ext_idx = jnp.asarray(pingpong_indices(t, video_length))

        @jax.jit
        def embed(v):
            v = v.astype(jnp.float32)[:, ext_idx]
            return i3d.apply(i3d_variables, preprocess_videos(v))

        return embed

    def embed(v):
        return embed_for_len(int(v.shape[1]))(v)

    real_embs, fake_embs = [], []
    steps = max(total // batch, 1)
    n_actual = steps * batch
    if n_actual != total:
        # no silent caps: eval_num not divisible by batch under-samples
        # (the reference truncates here too, utils_eval.py:86-96)
        print(f'evaluate: eval_num={total} not divisible by '
              f'batch={batch}; using {n_actual} samples')
    for it in range(steps):
        sample = next(dl_iter)
        text = jnp.asarray(sample['text'])
        frames = jnp.asarray(sample['target'])
        visual = (jnp.asarray(sample['visual'])
                  if model.cfg.num_visuals > 0 and 'visual' in sample
                  else None)
        key, k = jax.random.split(key)
        fake, _ = model.generate_images(
            k, text, visual=visual,
            mask_predict_steps=(args.mask_predict_steps[0]
                                if getattr(args, 'mask_predict_steps', None)
                                else 0),
            dynamic=getattr(args, 'pnag_dynamic', False),
            mp_config=args.mp_config)

        real_embs.append(np.asarray(embed(frames)))
        fake_embs.append(np.asarray(embed(fake)))

    real_embs = np.concatenate(real_embs)
    fake_embs = np.concatenate(fake_embs)
    np.save(out_dir / 'real_embs.npy', real_embs)
    np.save(out_dir / 'fake_embs.npy', fake_embs)

    results = {}
    if 'fvd' in metrics:
        fvd = frechet_distance(real_embs, fake_embs)
        results['fvd'] = fvd
        # record the actual sample count next to the score so a
        # non-divisible eval_num/batch pair is visible in the artifact
        (out_dir / 'fvd_score.txt').write_text(
            f'{fvd}\nn_samples = {len(fake_embs)}\n')
    if 'prd' in metrics:
        # 20 clusters like the reference, clamped for tiny smoke evals
        n_clusters = min(20, len(fake_embs))
        p, r = prd_mod.compute_prd_from_embedding(
            fake_embs, real_embs, num_clusters=n_clusters)
        pair = prd_mod.prd_to_max_f_beta_pair(p, r)
        results['prd'] = pair
        with open(out_dir / 'prd_data.pkl', 'wb') as f:
            pickle.dump({'precision': p, 'recall': r}, f)
        (out_dir / 'prd_score.txt').write_text(
            f'F_8 = {pair[0]}, F_1/8 = {pair[1]}\n')
    return results


def evaluate_clip(args, model, dl_iter, clip_encoders, key=None):
    """CLIP score: max-over-frames image-text similarity, mean ± std
    (utils_eval.py:226-323, with the generate_images_debug bug fixed).

    clip_encoders: (encode_text(tokens)->[B,D], encode_image(img)->[B,D]).
    """
    encode_text, encode_image = clip_encoders
    key = key if key is not None else jax.random.PRNGKey(args.seed)
    scores = []
    steps = max(args.eval_num // args.batch_size, 1)
    for _ in range(steps):
        sample = next(dl_iter)
        text = jnp.asarray(sample['text'])
        key, k = jax.random.split(key)
        fake, _ = model.generate_images(
            k, text, mp_config=args.mp_config,
            mask_predict_steps=(args.mask_predict_steps[0]
                                if getattr(args, 'mask_predict_steps', None)
                                else 0))
        t_emb = encode_text(sample['description'])
        t_emb = t_emb / np.linalg.norm(t_emb, axis=-1, keepdims=True)
        per_frame = []
        for f in range(fake.shape[1]):
            i_emb = np.asarray(encode_image(fake[:, f]))
            i_emb = i_emb / np.linalg.norm(i_emb, axis=-1, keepdims=True)
            per_frame.append((t_emb * i_emb).sum(-1))
        scores.append(np.max(np.stack(per_frame), axis=0))
    scores = np.concatenate(scores)
    out_dir = Path(getattr(args, 'log_metric_dir', 'metrics'))
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / 'clip_score.txt').write_text(
        f'{scores.mean()} +/- {scores.std()}\n')
    return float(scores.mean()), float(scores.std())
