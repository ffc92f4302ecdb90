"""Standalone PRD between two image folders.

Reference: precision_recall_distributions/prd_from_image_folders.py:70-141,
which embeds images with a frozen TF-Slim Inception pool_3 graph.  Here the
embedder is pluggable:

* ``inception`` — InceptionV3 pool_3 (the reference's embedder; pass a
  TF-slim checkpoint via --inception_path, see eval/inception.py)
* ``clip``  — CLIP ViT image encoder (requires --clip_path ViT-B-32.pt)
* ``pixels`` — downsampled raw pixels (weight-free sanity baseline)

Usage:
    python -m mmvid_tpu.eval.prd_folders --reference_dir A --eval_dirs B C \
        --embedder clip --clip_path ViT-B-32.pt --plot_path prd.png
"""

from __future__ import annotations

import argparse
import os
from typing import List

import numpy as np

from mmvid_tpu.eval import prd


IMG_EXTS = ('.png', '.jpg', '.jpeg', '.bmp')


def list_images(folder: str) -> List[str]:
    return sorted(
        os.path.join(folder, f) for f in os.listdir(folder)
        if f.lower().endswith(IMG_EXTS))


def load_images(paths: List[str], size: int = 224) -> np.ndarray:
    from mmvid_tpu.data.transforms import open_rgb, resize_exact, to_array
    return np.stack([to_array(resize_exact(open_rgb(p), (size, size)))
                     for p in paths])


def make_embedder(kind: str, clip_path: str | None = None, batch: int = 32,
                  inception_path: str | None = None):
    if kind == 'inception':
        import jax
        import jax.numpy as jnp
        from mmvid_tpu.eval.inception import (
            InceptionV3,
            inception_preprocess,
            load_inception_checkpoint,
        )
        model = InceptionV3()
        if inception_path:
            variables = load_inception_checkpoint(inception_path)
        else:
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 299, 299, 3)))
        fn = jax.jit(lambda v, x: model.apply(v, inception_preprocess(x)))

        def embed(images01: np.ndarray) -> np.ndarray:
            outs = []
            for i in range(0, len(images01), batch):
                outs.append(np.asarray(
                    fn(variables, jnp.asarray(images01[i:i + batch]))))
            return np.concatenate(outs)

        return embed
    if kind == 'clip':
        from mmvid_tpu.models.clip_full import load_clip_scorer
        import jax.numpy as jnp
        scorer = load_clip_scorer(clip_path)

        def embed(images01: np.ndarray) -> np.ndarray:
            outs = []
            for i in range(0, len(images01), batch):
                outs.append(np.asarray(scorer.encode_image(
                    jnp.asarray(images01[i:i + batch]))))
            return np.concatenate(outs)

        return embed
    if kind == 'pixels':
        def embed(images01: np.ndarray) -> np.ndarray:
            import jax
            import jax.numpy as jnp
            x = jnp.asarray(images01)
            x = jax.image.resize(x, (x.shape[0], 16, 16, 3), 'bilinear')
            return np.asarray(x.reshape(x.shape[0], -1))

        return embed
    raise NotImplementedError(kind)


def compute_folder_prd(reference_dir: str, eval_dirs: List[str],
                       embedder, num_clusters: int = 20,
                       num_runs: int = 10):
    ref_paths = list_images(reference_dir)
    results = []
    for d in eval_dirs:
        eval_paths = list_images(d)
        n = min(len(ref_paths), len(eval_paths))
        ref_emb = embedder(load_images(ref_paths[:n]))
        eval_emb = embedder(load_images(eval_paths[:n]))
        p, r = prd.compute_prd_from_embedding(
            eval_emb, ref_emb, num_clusters=min(num_clusters, n),
            num_runs=num_runs)
        results.append((p, r))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reference_dir', required=True)
    ap.add_argument('--eval_dirs', nargs='+', required=True)
    ap.add_argument('--embedder', default='inception',
                    choices=['inception', 'clip', 'pixels'])
    ap.add_argument('--clip_path', default='ViT-B-32.pt')
    ap.add_argument('--inception_path', default=None,
                    help='TF-slim InceptionV3 checkpoint (or .npz)')
    ap.add_argument('--num_clusters', type=int, default=20)
    ap.add_argument('--num_runs', type=int, default=10)
    ap.add_argument('--plot_path', default=None)
    args = ap.parse_args()

    embedder = make_embedder(args.embedder, args.clip_path,
                             inception_path=args.inception_path)
    results = compute_folder_prd(args.reference_dir, args.eval_dirs,
                                 embedder, args.num_clusters, args.num_runs)
    for d, (p, r) in zip(args.eval_dirs, results):
        f8, f18 = prd.prd_to_max_f_beta_pair(p, r)
        print(f'{d}: F_8={f8:.4f} F_1/8={f18:.4f}')
    if args.plot_path:
        prd.plot(results, labels=args.eval_dirs, out_path=args.plot_path)


if __name__ == '__main__':
    main()
