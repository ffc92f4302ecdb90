#!/usr/bin/env python3
"""One-command real-weight validation gate (round-2 VERDICT item 6).

Runs the whole released-weights chain — load dalle.pt (+ embedded/explicit
VQGAN), optionally the ViT-B-32 jit archive and the kinetics I3D — then
samples videos and computes FVD with the reference's exact protocol
(2048 samples, batch 16, ping-pong extension to 15/16 frames; matches
scripts/mmvoxceleb/text_to_video/evaluation.sh + utils/utils_eval.py:31-219)
and prints a PASS/FAIL verdict against the published 59.46 ± tolerance
(/root/reference/README.md:143).

Each stage fails with its own message so a weight-provisioned environment
can localize problems in one run:

    python scripts/validate_weights.py \
        --dalle vox_bert_text_bs48_100k.pt \
        --i3d i3d_kinetics400.npz \
        --data /datasets/mmvoxceleb \
        [--clip ViT-B-32.pt] [--vae vae_vox.ckpt] \
        [--eval_num 2048] [--expected_fvd 59.46] [--tolerance 1.0]

CI dry-run (synthetic weights, random I3D, tiny eval_num) is covered by
tests/test_validate_weights.py.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


# spec-decode enable threshold: chunk_ms / token_ms from the round-5
# v5e floor measurement, at the CONSERVATIVE end (b64; b16 is lower:
# 1.07 / 1.27) — speculative decode wins iff the realised
# tokens-per-chunk exceeds this (ROADMAP round-5)
SPEC_BREAK_EVEN = {4: 1.3, 8: 1.5}


def _stage(name):
    print(f'[validate_weights] stage: {name}', flush=True)


def _fail(name, exc):
    print(f'[validate_weights] FAILED at stage "{name}": '
          f'{type(exc).__name__}: {exc}', file=sys.stderr)
    raise SystemExit(2)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('--dalle', required=True,
                   help='released dalle.pt (or native orbax checkpoint dir)')
    p.add_argument('--data', required=True,
                   help='Multimodal VoxCeleb root (video/ + txt/ trees)')
    p.add_argument('--vae', default=None,
                   help='taming vae_vox.ckpt; optional when dalle.pt embeds '
                        'the VQGAN weights (the released ones do)')
    p.add_argument('--clip', default=None,
                   help='ViT-B-32.pt jit archive (optional: only exercises '
                        'the converter + CLIP scorer load)')
    p.add_argument('--i3d', default=None,
                   help='kinetics-400 I3D (TF ckpt dir or .npz); without '
                        'it --allow_random_i3d is required and FVD is NOT '
                        'comparable to the published number')
    p.add_argument('--dataset', default='vox')
    p.add_argument('--eval_num', type=int, default=2048)
    p.add_argument('--batch_size', type=int, default=16)
    p.add_argument('--mask_predict_steps', type=int, default=0,
                   help='0 = the mp_config schedule default (T=20)')
    p.add_argument('--frame_num', type=int, default=None,
                   help='real-clip frame count (default: flag default)')
    p.add_argument('--frame_step', type=int, default=None)
    p.add_argument('--expected_fvd', type=float, default=59.46)
    p.add_argument('--tolerance', type=float, default=1.0)
    p.add_argument('--no_gate', action='store_true',
                   help='report FVD without pass/fail gating (e.g. for '
                        'non-flagship checkpoints with no published number)')
    p.add_argument('--int8', action='store_true',
                   help='additionally run the FVD protocol through the '
                        'w8a8 int8 serving path (ops/int8.py, calibrated '
                        'on a real --data batch) and report the '
                        'bf16->int8 FVD delta; the int8 run is reported, '
                        'not gated')
    p.add_argument('--int8_percentile', default=None,
                   choices=['absmax', '99.9', '99.99'],
                   help='int8 activation-scale calibration: abs-max '
                        '(default) or percentile clipping of |x| outliers')
    p.add_argument('--spec', type=int, default=0, metavar='K',
                   help='(ART-V checkpoints) probe the exact speculative '
                        'decode on the real weights: check greedy '
                        'spec-vs-baseline token equality on one batch, '
                        'measure the realised acceptance (tokens/chunk) '
                        'at serving temperature, and print the '
                        'enable/disable recommendation against the '
                        'measured break-even (ROADMAP round-5)')
    p.add_argument('--allow_random_i3d', action='store_true',
                   help='CI dry-run only: random I3D weights')
    p.add_argument('--out_dir', default='validate_weights_out')
    return p


def main(argv=None):
    opts = build_parser().parse_args(argv)

    from mmvid_tpu.config import process_args

    # full reference-compatible flag surface with eval-protocol settings
    argv2 = ['--name', 'validate_weights',
             '--image_text_folder', opts.data,
             '--dataset', opts.dataset,
             '--dalle_path', opts.dalle,
             '--eval_mode', 'eval',
             '--eval_num', str(opts.eval_num),
             '--batch_size', str(opts.batch_size),
             '--deterministic']
    if opts.frame_num is not None:
        argv2 += ['--frame_num', str(opts.frame_num)]
    if opts.frame_step is not None:
        argv2 += ['--frame_step', str(opts.frame_step)]
    args = process_args(train=False, argv=argv2)
    args.log_metric_dir = opts.out_dir
    Path(opts.out_dir).mkdir(parents=True, exist_ok=True)

    # ---- stage 1: model checkpoint ----
    _stage(f'load model checkpoint {opts.dalle}')
    vae_params = cvae_params = None
    hparams = {}
    try:
        if str(opts.dalle).endswith('.pt'):
            from mmvid_tpu.utils.torch_compat import load_dalle_checkpoint
            ckpt = load_dalle_checkpoint(opts.dalle)
            params, hparams = ckpt['params'], ckpt.get('hparams') or {}
            vae_params, cvae_params = ckpt.get('vae'), ckpt.get('cvae')
        else:
            from mmvid_tpu.utils.checkpoint import load_checkpoint
            tree, hparams = load_checkpoint(opts.dalle)
            params, hparams = tree['params'], hparams or {}
    except Exception as e:                              # noqa: BLE001
        _fail('load model checkpoint', e)
    for k in ('dim', 'text_seq_len', 'num_targets', 'num_visuals',
              'which_transformer', 'image_size', 'insert_sep',
              'use_separate_visual_emb', 'fixed_language_model',
              'text_emb_bottleneck', 'loss_img_weight', 'ar'):
        if k in hparams and hparams[k] is not None:
            setattr(args, k, hparams[k])
    print(f'  dim={args.dim} targets={args.num_targets} '
          f'text_seq_len={args.text_seq_len}')

    # ---- stage 2: VQGAN ----
    _stage('build VQGAN' + (f' from {opts.vae}' if opts.vae
                            else ' (weights embedded in dalle.pt)'))
    try:
        from mmvid_tpu import factories
        if opts.vae:
            args.vae_path = opts.vae
        vae = factories.get_vae_model(args, which_vae='vae',
                                      image_size=args.image_size)
        if vae_params is not None and not opts.vae:
            vae.params = vae_params
        elif vae_params is None and not opts.vae:
            raise ValueError(
                'checkpoint embeds no VQGAN weights and --vae not given')
        cvae = None
        if cvae_params is not None:
            cvae = factories.get_vae_model(args, which_vae='cvae',
                                           image_size=args.image_size)
            cvae.params = cvae_params
    except SystemExit:
        raise
    except Exception as e:                              # noqa: BLE001
        _fail('build VQGAN', e)

    # ---- stage 3: model build + weight graft ----
    _stage('build model + graft weights')
    try:
        from mmvid_tpu.parallel.pipeline import adapt_stack_layout
        tokenizer = factories.get_tokenizer(args)
        model = factories.get_dalle(args, vae, cvae)
        model.params = adapt_stack_layout(params, model.cfg.clip.layers,
                                          False)
    except Exception as e:                              # noqa: BLE001
        _fail('build model + graft weights', e)

    # ---- stage 4 (optional): ViT-B-32 jit archive ----
    if opts.clip:
        _stage(f'load CLIP jit archive {opts.clip}')
        try:
            from mmvid_tpu.models.clip_full import load_clip_scorer
            load_clip_scorer(opts.clip)
        except Exception as e:                          # noqa: BLE001
            _fail('load CLIP jit archive', e)

    # ---- stage 5: I3D ----
    i3d_vars = None
    if opts.i3d:
        _stage(f'load I3D {opts.i3d}')
        try:
            from mmvid_tpu.eval.i3d import load_i3d_checkpoint
            i3d_vars = load_i3d_checkpoint(opts.i3d)
        except Exception as e:                          # noqa: BLE001
            _fail('load I3D', e)
    elif opts.allow_random_i3d:
        args.allow_random_i3d = True
        print('  WARNING: random I3D weights — FVD is NOT comparable to '
              'the published number (CI dry-run mode)')
    else:
        _fail('load I3D', ValueError(
            '--i3d is required (or --allow_random_i3d for a CI dry-run)'))

    # ---- stage 6: dataset ----
    _stage(f'scan dataset {opts.data}')
    try:
        from mmvid_tpu.data.loader import DataLoader, infinite_batches
        dataset = factories.get_dataset(args, tokenizer)
        n = len(dataset)
        if n == 0:
            raise ValueError('dataset is empty')
        print(f'  {n} samples')
        loader = DataLoader(dataset, batch_size=args.batch_size,
                            shuffle=False, num_workers=0, seed=args.seed,
                            drop_last=True)
        dl_iter = infinite_batches(loader)
    except Exception as e:                              # noqa: BLE001
        _fail('scan dataset', e)

    # ---- stage 7: sample + FVD protocol ----
    _stage(f'generate {opts.eval_num} samples + FVD '
           f'(batch {args.batch_size})')
    try:
        from mmvid_tpu.eval.evaluate import evaluate
        if opts.mask_predict_steps > 0:
            args.mask_predict_steps = [opts.mask_predict_steps]
        results = evaluate(args, model, dl_iter, i3d_variables=i3d_vars,
                           metrics=('fvd',))
        fvd = float(results['fvd'])
    except SystemExit:
        raise
    except Exception as e:                              # noqa: BLE001
        _fail('sample + FVD', e)

    # ---- stage 7b (optional): ART-V speculative-decode probe ----
    if opts.spec:
        _stage(f'spec probe: --spec {opts.spec} greedy parity + acceptance')
        try:
            if not getattr(args, 'ar', False):
                raise ValueError(
                    '--spec probes the ART-V (autoregressive) decode; this '
                    'checkpoint is the BERT mask-predict model')
            import os as _os

            import jax
            import jax.numpy as jnp
            import numpy as np

            batch = next(dl_iter)
            text = jnp.asarray(batch['text'])
            visual = (jnp.asarray(batch['visual'])
                      if model.cfg.num_visuals > 0 and 'visual' in batch
                      else None)
            key = jax.random.PRNGKey(args.seed)
            # greedy exactness on THESE weights: spec and baseline decode
            # must be token-identical at T->0 (tests prove it on synthetic
            # weights; this reruns the check on the released ones)
            _os.environ['MMVID_ARTV_SPEC'] = str(opts.spec)
            _, seq_spec, _ = model.generate_images(
                key, text, visual=visual, decode=False, spec_stats=True,
                temperature=1e-6)
            # acceptance at the serving temperature (T=1): the number the
            # docs' enable-iff rule needs
            _, _, steps = model.generate_images(
                key, text, visual=visual, decode=False, spec_stats=True,
                temperature=1.0)
            del _os.environ['MMVID_ARTV_SPEC']
            _, seq_base, _ = model.generate_images(
                key, text, visual=visual, decode=False, spec_stats=True,
                temperature=1e-6)
            if not np.array_equal(np.asarray(seq_spec),
                                  np.asarray(seq_base)):
                raise ValueError(
                    'greedy speculative tokens differ from the baseline '
                    'decode — exactness violated on these weights')
            tpc = float(((model.cfg.target_seq_len - 1)
                         / np.maximum(np.asarray(steps), 1)).mean())
            be = SPEC_BREAK_EVEN.get(opts.spec, SPEC_BREAK_EVEN[8])
            rec = (f'ENABLE --spec {opts.spec} for serving'
                   if tpc >= be else f'keep --spec OFF (< {be})')
            print(f'  greedy spec == baseline: OK; realised acceptance '
                  f'{tpc:.2f} tokens/chunk at T=1 (ceiling '
                  f'{opts.spec + 1}; measured break-even ~{be}) -> {rec}')
        except SystemExit:
            raise
        except Exception as e:                          # noqa: BLE001
            _fail('spec probe', e)

    # ---- stage 8 (optional): int8 serving-path FVD ----
    fvd_int8 = None
    if opts.int8:
        pct = (None if opts.int8_percentile in (None, 'absmax')
               else float(opts.int8_percentile))
        _stage('int8: quantize (real-data calibration batch) + FVD')
        try:
            if getattr(args, 'ar', False):
                raise ValueError(
                    '--int8 validates the BERT w8a8 serving path; the '
                    'ART-V int8 decode measured slower than bf16 '
                    '(ROADMAP.md) and is not the serving recommendation')
            from mmvid_tpu.ops.int8 import quantize_for_serving
            calib_batch = next(dl_iter)
            import jax.numpy as jnp
            model8 = quantize_for_serving(
                model, text=jnp.asarray(calib_batch['text']),
                percentile=pct)
            args.log_metric_dir = str(Path(opts.out_dir) / 'int8')
            Path(args.log_metric_dir).mkdir(parents=True, exist_ok=True)
            results8 = evaluate(args, model8, dl_iter,
                                i3d_variables=i3d_vars, metrics=('fvd',))
            fvd_int8 = float(results8['fvd'])
        except SystemExit:
            raise
        except Exception as e:                          # noqa: BLE001
            _fail('int8 quantize + FVD', e)

    # ---- verdict ----
    print(f'[validate_weights] FVD = {fvd:.3f} '
          f'(published reference: {opts.expected_fvd})')
    if fvd_int8 is not None:
        print(f'[validate_weights] int8 FVD = {fvd_int8:.3f} '
              f'(bf16->int8 delta {fvd_int8 - fvd:+.3f}, calibration: '
              f'{opts.int8_percentile or "absmax"}) — reported, not gated')
    if opts.no_gate or opts.allow_random_i3d and not opts.i3d:
        print('[validate_weights] DONE (no gate applied)')
        return 0
    delta = abs(fvd - opts.expected_fvd)
    if delta <= opts.tolerance:
        print(f'[validate_weights] PASS (|delta| = {delta:.3f} '
              f'<= {opts.tolerance})')
        return 0
    print(f'[validate_weights] FAIL (|delta| = {delta:.3f} '
          f'> {opts.tolerance})')
    return 1


if __name__ == '__main__':
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    raise SystemExit(main())
