#!/usr/bin/env python3
"""Test/eval driver (reference test.py:27-292), TPU-native.

Same CLI as the reference test.sh/evaluation.sh scripts.  Loads the latest
(or given) checkpoint, rebuilds the model, and routes to sampling
visualization, long-video generation, or quantitative FVD/PRD/CLIP eval.
Determinism mirrors the reference (seeded, deterministic loader,
test.py:44-47).
"""

from __future__ import annotations

import os
import random
import sys
from pathlib import Path

import numpy as np


def main():
    from mmvid_tpu.config import process_args
    args = process_args(train=False)
    main_worker(args)


def main_worker(args):
    import jax
    import jax.numpy as jnp

    from mmvid_tpu import factories
    from mmvid_tpu.data.loader import DataLoader, infinite_batches
    from mmvid_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint

    # MMVID_ARTV_SPEC_FORCE accepts every speculative draft — a bench-only
    # ceiling knob whose output is garbage by design (artv_spec.py); refuse
    # it here the way training refuses serving-only flags (training.py)
    if (os.environ.get('MMVID_ARTV_SPEC_FORCE') == '1'
            and not getattr(args, 'bench_unsafe', False)):
        raise SystemExit(
            'MMVID_ARTV_SPEC_FORCE=1 is a bench-only ceiling knob that '
            'accepts all speculative drafts — outputs would be garbage. '
            'Unset it, or pass --bench_unsafe if you really are '
            'benchmarking through this CLI.')

    random.seed(args.seed)
    np.random.seed(args.seed)
    args.deterministic = True
    args.batch_size = 16 if args.eval_mode == 'eval' else args.batch_size
    # pp is a TRAINING topology: inference always runs the sequential block
    # layout (the KV-cached AR sampler and generation cache address
    # per-block params); pp-trained checkpoints are converted on load below
    if args.mesh_shape and 'pp=' in args.mesh_shape:
        import re as _re
        args.mesh_shape = _re.sub(r'pp=\d+', 'pp=1', args.mesh_shape)

    log_dir = Path(args.log_root) / (args.name + args.name_suffix)
    args.log_metric_dir = str(log_dir / 'metrics')

    # ---- checkpoint discovery (reference test.py:51-57) ----
    ckpt_path = args.dalle_path
    if ckpt_path is None:
        train_dir = Path(args.log_root) / args.name
        ckpt_path = latest_checkpoint(str(train_dir))
        assert ckpt_path is not None, f'no checkpoint under {train_dir}'
    print(f'loading checkpoint {ckpt_path}')

    vae_params = cvae_params = None
    hparams = {}
    if str(ckpt_path).endswith('.pt'):
        from mmvid_tpu.utils.torch_compat import load_dalle_checkpoint
        ckpt = load_dalle_checkpoint(str(ckpt_path))
        params, hparams = ckpt['params'], ckpt.get('hparams') or {}
        vae_params, cvae_params = ckpt.get('vae'), ckpt.get('cvae')
    else:
        tree, hparams = load_checkpoint(str(ckpt_path))
        params = tree['params']
        hparams = hparams or {}

    # hparams frozen into the checkpoint override CLI (train.py:160-174)
    for k in ('dim', 'text_seq_len', 'num_targets', 'num_visuals',
              'which_transformer', 'image_size', 'insert_sep',
              'use_separate_visual_emb', 'fixed_language_model',
              'text_emb_bottleneck', 'loss_img_weight', 'ar'):
        if k in hparams and hparams[k] is not None:
            setattr(args, k, hparams[k])

    tokenizer = factories.get_tokenizer(args)
    language_model, text_feature_dim = None, 0
    if args.fixed_language_model is not None:
        language_model, text_feature_dim = \
            factories.get_fixed_language_model(args)

    vae = factories.get_vae_model(args, which_vae='vae',
                                  image_size=args.image_size)
    if vae_params is not None:
        vae.params = vae_params
    cvae = None
    if args.use_cvae or cvae_params is not None:
        cvae = factories.get_vae_model(args, which_vae='cvae',
                                       image_size=args.image_size)
        if cvae_params is not None:
            cvae.params = cvae_params

    model = factories.get_dalle(args, vae, cvae,
                                text_feature_dim=text_feature_dim)
    # training with a pp mesh stores the backbone blocks stacked; inference
    # always runs the sequential (per-block) layout
    from mmvid_tpu.parallel.pipeline import adapt_stack_layout
    model.params = adapt_stack_layout(
        params, model.cfg.clip.layers,
        model.cfg.clip.pipeline_stages > 1)
    if getattr(args, 'spec', 0):
        if not args.ar:
            raise SystemExit('--spec requires --ar (speculative decode '
                             'accelerates the autoregressive sampler)')
        if getattr(args, 'int8', False):
            raise SystemExit('--spec is a bf16 decode path; drop --int8')
        os.environ['MMVID_ARTV_SPEC'] = str(args.spec)
        print(f'speculative AR decode: chunks of {args.spec} '
              f'copy-previous-frame drafts, exact verification')
    if getattr(args, 'int8', False):
        if args.ar:
            # ART-V int8 serving lives inside ar_sample (int8 weights +
            # int8 KV caches); route it through generate_images(int8=True)
            _orig_gen = model.generate_images

            def _gen_int8(*a, **kw):
                kw.setdefault('int8', True)
                return _orig_gen(*a, **kw)

            model.generate_images = _gen_int8
            print('int8: ART-V decode (int8 weights + int8 KV caches). '
                  'NB measured SLOWER than bf16 on v5e (ROADMAP.md): the '
                  'decode step is op-overhead-bound, not bandwidth-bound.')
        else:
            from mmvid_tpu.ops.int8 import quantize_for_serving
            model = quantize_for_serving(model)
            print('int8: backbone quantized (w8a8, calibrated static '
                  'scales)')

    dataset = factories.get_dataset(args, tokenizer)
    print(f'{len(dataset)} samples found')
    if len(dataset) == 0:
        raise SystemExit(
            'dataset is empty after filtering (e.g. every clip shorter '
            'than the min_len=8 frame requirement)')
    loader = DataLoader(dataset, batch_size=args.batch_size,
                        shuffle=not args.deterministic,
                        num_workers=min(args.num_workers, 16),
                        seed=args.seed, drop_last=True)
    dl_iter = infinite_batches(loader)

    key = jax.random.PRNGKey(args.seed)

    if args.eval_mode == 'eval':
        from mmvid_tpu.eval.evaluate import evaluate
        i3d_vars = None
        i3d_path = os.environ.get('I3D_CHECKPOINT')
        if i3d_path:
            from mmvid_tpu.eval.i3d import load_i3d_checkpoint
            i3d_vars = load_i3d_checkpoint(i3d_path)
        metrics = []
        if any('fvd' in m for m in args.eval_metric):
            metrics.append('fvd')
        if any('prd' in m for m in args.eval_metric):
            metrics.append('prd')
        results = {}
        if metrics or not any('clip' in m for m in args.eval_metric):
            results = evaluate(args, model, dl_iter, i3d_variables=i3d_vars,
                               key=key, metrics=metrics or ('fvd', 'prd'))
        if any('clip' in m for m in args.eval_metric):
            from mmvid_tpu.eval.evaluate import evaluate_clip
            from mmvid_tpu.models.clip_full import load_clip_scorer
            scorer = load_clip_scorer(args.openai_clip_model_path)

            def encode_text(descriptions):
                toks = tokenizer.tokenize(list(descriptions), 77,
                                          truncate_text=True)
                return np.asarray(scorer.encode_text(toks))

            results['clip'] = evaluate_clip(
                args, model, dl_iter,
                (encode_text, scorer.encode_image), key=key)
        print(results)
        return results

    if args.eval_mode == 'long':
        from mmvid_tpu.utils.viz import visualize_long
        batch = next(dl_iter)
        if args.description is not None:
            batch['text'] = tokenizer.tokenize(
                [args.description] * args.batch_size, args.text_seq_len,
                truncate_text=True)
            batch['description'] = [args.description] * args.batch_size
        out_dir = str(log_dir / 'long')
        video = visualize_long(
            model, batch, key, out_dir, long_mode=args.long_mode,
            t_repeat=args.t_repeat, t_overlap=args.t_overlap,
            mask_predict_steps=args.mask_predict_steps[0],
            mp_config=args.mp_config)
        if args.save_codebook:
            toks = model.get_image_tokens(jnp.asarray(video))
            np.save(str(log_dir / 'codebook_long.npy'), np.asarray(toks))
        print(f'wrote {video.shape[1]}-frame videos to {out_dir}')
        return video

    # default: sampling visualization (reference visualize_test)
    from mmvid_tpu.utils.viz import visualize_train
    webpage = None
    if args.use_html:
        from mmvid_tpu.utils.html import initialize_webpage
        webpage = initialize_webpage(str(log_dir / 'web'),
                                     'MMVID-TPU test: ' + args.name, False)
    batch = next(dl_iter)
    if args.description is not None:
        batch['text'] = tokenizer.tokenize(
            [args.description] * args.batch_size, args.text_seq_len,
            truncate_text=True)
        batch['description'] = [args.description] * args.batch_size
    if language_model is not None:
        batch['text'] = language_model(batch['description'])
    visualize_train(model, batch, key, str(log_dir / 'samples'), 0,
                    n_sample=args.n_sample,
                    n_per_sample=args.n_per_sample,
                    mask_predict_steps=args.mask_predict_steps,
                    mask_predict_steps1=args.mask_predict_steps1,
                    vc_mode=args.vc_mode,
                    rand_visual=args.rand_visual,
                    counterfactual=(args.num_visuals > 0),
                    debug=getattr(args, 'debug', False),
                    test_mode=getattr(args, 'test_mode', None),
                    webpage=webpage, mp_config=args.mp_config)
    print(f'wrote samples to {log_dir / "samples"}')


if __name__ == '__main__':
    main()
