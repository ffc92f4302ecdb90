#!/usr/bin/env python3
"""Training driver (reference train.py:47-395), TPU-native.

Same CLI as the reference (scripts/mmvoxceleb/*/train.sh run unchanged).
Instead of one-process-per-GPU DDP (reference train.py:28-97), a single
SPMD program runs over a jax.sharding.Mesh: the batch is dp-sharded, the
whole MSM/REL/VID step is one compiled XLA program, and rank-0-only side
effects become process_index==0 gating.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np


def main():
    from mmvid_tpu.config import process_args
    args = process_args(train=True)
    maybe_init_distributed(args)
    main_worker(args)


def maybe_init_distributed(args):
    """Multi-host TPU pods: one process per host joins the SPMD program
    (replaces the reference's mp.spawn + NCCL rendezvous,
    train.py:52-97).  Triggered by --multiprocessing_distributed or the
    standard TPU pod env; single-host runs skip it."""
    if getattr(args, 'multiprocessing_distributed', False) or \
            os.environ.get('MEGASCALE_COORDINATOR_ADDRESS') or \
            os.environ.get('JAX_COORDINATOR_ADDRESS'):
        import jax
        try:
            jax.distributed.initialize()
        except Exception as e:  # already initialized / single host
            print(f'jax.distributed.initialize skipped: {e}')


def is_root():
    import jax
    return jax.process_index() == 0


def main_worker(args):
    import jax
    import jax.numpy as jnp

    from mmvid_tpu import factories
    from mmvid_tpu.data.loader import DataLoader, infinite_batches
    from mmvid_tpu.parallel.mesh import make_mesh
    from mmvid_tpu.training import (
        TrainConfig,
        create_train_state,
        jit_train_step,
    )
    from mmvid_tpu.utils.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )

    log_dir = Path(args.log_root) / args.name
    log_sample_dir = log_dir / 'samples'
    if is_root():
        log_dir.mkdir(parents=True, exist_ok=True)
        log_sample_dir.mkdir(exist_ok=True)
        (log_dir / 'args.txt').write_text(
            '\n'.join(f'{k}={v}' for k, v in sorted(vars(args).items())))

    webpage = None
    if args.use_html and is_root():
        from mmvid_tpu.utils.html import initialize_webpage
        webpage = initialize_webpage(
            str(log_dir / 'web'), 'MMVID-TPU: ' + args.name, False)

    # ---- components (reference train.py:129-234) ----
    tokenizer = factories.get_tokenizer(args)
    language_model, text_feature_dim, tokenizer2 = None, 0, None
    if args.fixed_language_model is not None:
        language_model, text_feature_dim = \
            factories.get_fixed_language_model(args)

    vae = factories.get_vae_model(args, which_vae='vae',
                                  image_size=args.image_size)
    cvae = None
    if args.cvae_path:
        cvae = factories.get_vae_model(args, which_vae='cvae',
                                       image_size=args.image_size)

    model = factories.get_dalle(args, vae, cvae,
                                text_feature_dim=text_feature_dim)

    # --auto_resume: a restarted job (same command line, e.g. after the
    # SIGTERM preemption checkpoint below) picks up its own weights/last —
    # refreshed by periodic, preemption, and final saves — restoring
    # params, optimizer moments, and the schedule position.
    if getattr(args, 'auto_resume', False) and not args.dalle_path:
        last = log_dir / 'weights' / 'last'
        if last.is_dir():
            args.dalle_path = str(last)
            if is_root():
                print(f'auto_resume: restoring from {last}')

    start_iter = args.start_iter or 0
    resume_opt_leaves = None
    # checkpoints carry the per-block (reference-compatible) or the stacked
    # pipeline layout; adapt to whatever this run's model uses
    from mmvid_tpu.parallel.pipeline import adapt_stack_layout
    pipelined = model.cfg.clip.pipeline_stages > 1
    n_layers = model.cfg.clip.layers
    ckpt_pipelined, ckpt_params = pipelined, None
    if args.dalle_path:
        if str(args.dalle_path).endswith('.pt'):
            from mmvid_tpu.utils.torch_compat import load_dalle_checkpoint
            ckpt = load_dalle_checkpoint(args.dalle_path)
            model.params = adapt_stack_layout(ckpt['params'], n_layers,
                                              pipelined)
            if ckpt.get('vae'):
                vae.params = ckpt['vae']
            start_iter = args.start_iter if args.start_iter is not None \
                else ckpt.get('iter', 0) or 0
        else:
            tree, _ = load_checkpoint(args.dalle_path)
            ckpt_params = tree['params']
            ckpt_pipelined = 'blocks' in ckpt_params.get('transformer', {})
            model.params = adapt_stack_layout(ckpt_params, n_layers,
                                              pipelined)
            # resume restores the optimizer moments + schedule position too
            # (reference saves 'optimizer', utils/utils_train.py:297-305)
            resume_opt_leaves = tree.get('opt_state')
            if args.start_iter is None and 'step' in tree:
                start_iter = int(np.asarray(tree['step']))

    dataset = factories.get_dataset(args, tokenizer)
    if getattr(args, 'limit_train_batches', 1) < 1:
        # random subset of the dataset (reference train.py:217-219)
        from mmvid_tpu.data.loader import Subset
        rng = np.random.RandomState(args.seed)
        keep = int(args.limit_train_batches * len(dataset))
        dataset = Subset(dataset,
                         rng.permutation(len(dataset))[:max(keep, 1)])
    if is_root():
        print(f'{len(dataset)} samples found')
    if len(dataset) == 0:
        raise SystemExit(
            'dataset is empty after filtering (e.g. every clip shorter '
            'than the min_len=8 frame requirement) — infinite_batches '
            'would spin forever on it')
    # args.batch_size is the GLOBAL batch (the reference divides it per
    # rank, train.py:95-97); each host loads its local slice.
    n_proc = jax.process_count()
    assert args.batch_size % n_proc == 0, (
        f'batch_size {args.batch_size} not divisible by {n_proc} hosts')
    loader = DataLoader(dataset, batch_size=args.batch_size // n_proc,
                        num_workers=min(args.num_workers, 16),
                        seed=args.seed,
                        process_index=jax.process_index(),
                        process_count=n_proc)
    batches = infinite_batches(loader)

    tc = TrainConfig(
        learning_rate=args.learning_rate, optimizer=args.optimizer,
        lr_scheduler=(args.lr_scheduler if args.lr_decay else 'none'),
        lr_scheduler_warmup=args.lr_scheduler_warmup,
        lr_scheduler_step_size=args.lr_scheduler_step_size,
        lr_scheduler_every=args.lr_scheduler_every,
        total_steps=args.iters, weight_decay=args.weight_decay,
        clip_grad_norm=args.clip_grad_norm, beta_msm=args.beta_msm,
        beta_rel=args.beta_rel, beta_vid=args.beta_vid,
        msm_strategy_prob=tuple(args.msm_strategy_prob),
        msm_bernoulli_prob=tuple(args.msm_bernoulli_prob),
        vid_strategy_prob=tuple(args.vid_strategy_prob),
        pc_prob=args.pc_prob,
        rel_no_fully_masked=args.rel_no_fully_masked, negvc=args.negvc,
        rand_visual=args.rand_visual, fullvc=args.fullvc,
        vc_mode=args.vc_mode, visual_aug_mode=args.visual_aug_mode,
        dropout_vc=args.dropout_vc)

    mesh_spec = args.mesh_shape
    if mesh_spec is None:
        # default all-DP, shrunk to the largest dp that divides the batch
        import math
        dp = math.gcd(len(jax.devices()), args.batch_size)
        if dp < len(jax.devices()) and is_root():
            print(f'batch {args.batch_size} not divisible by '
                  f'{len(jax.devices())} devices; using dp={dp}')
        mesh_spec = f'dp={dp},tp=1'
        devices = jax.devices()[:dp]
        mesh = make_mesh(mesh_spec, devices=devices)
    else:
        mesh = make_mesh(mesh_spec)
    step_fn = jit_train_step(model, tc, mesh=mesh)
    state = create_train_state(model, tc)
    if resume_opt_leaves is not None:
        from mmvid_tpu.training import (
            adapt_opt_state_layout,
            make_optimizer,
            opt_state_from_leaves,
        )
        if ckpt_pipelined != pipelined:
            # the checkpoint's Adam moments are params-shaped in the OTHER
            # block layout: rebuild them against a template of that layout,
            # then convert (training.py::adapt_opt_state_layout)
            tmpl = make_optimizer(tc).init(ckpt_params)
            restored = adapt_opt_state_layout(
                opt_state_from_leaves(tmpl, resume_opt_leaves),
                n_layers, pipelined)
        else:
            restored = opt_state_from_leaves(state.opt_state,
                                             resume_opt_leaves)
        state = state.replace(
            opt_state=restored, step=jnp.asarray(start_iter, jnp.int32))
    state = step_fn.shard_state(state)

    # ONE common base key across hosts: the step key is a replicated SPMD
    # input, so every process must pass the same value (per-process keys are
    # undefined under GSPMD).  Per-step keys are fold_in(base, idx) —
    # root-only side effects (viz) use a disjoint stream so they cannot
    # desync the hosts' key sequence.
    base_key = jax.random.PRNGKey(args.seed)
    viz_key = jax.random.PRNGKey(args.seed ^ 0x5eed5eed)
    log_path = log_dir / 'log.txt'
    t0 = time.time()

    # first-class tracing (the reference has none, SURVEY.md §5): capture a
    # profiler trace of steps 10-15 when --profile_dir is set
    profile_dir = getattr(args, 'profile_dir', None)

    hparams = {k: v for k, v in vars(args).items()
               if isinstance(v, (int, float, str, bool, type(None)))}

    # --async_ckpt: periodic saves overlap with training; emergency/final
    # saves below first wait() so weights/last is never written twice at
    # once
    ckpt_writer = None
    if getattr(args, 'async_ckpt', False) and is_root():
        from mmvid_tpu.utils.checkpoint import AsyncCheckpointWriter
        ckpt_writer = AsyncCheckpointWriter()

    def ckpt_tree(idx):
        from mmvid_tpu.training import opt_state_leaves
        model.params = jax.device_get(state.params)
        return {'step': idx, 'params': model.params,
                'opt_state': opt_state_leaves(
                    jax.device_get(state.opt_state))}

    # Graceful preemption (beyond-parity; the reference restarts manually,
    # SURVEY.md §5): TPU fleet schedulers deliver SIGTERM ahead of
    # reclaiming capacity — finish the in-flight step, write a resumable
    # checkpoint, and exit 0 so the job supervisor restarts cleanly from
    # --start_iter.
    import signal
    preempted = {'sig': None}

    def _on_term(signum, frame):
        preempted['sig'] = signum

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_term)
        except (ValueError, OSError):  # non-main thread (tests)
            pass

    try:
        for idx in range(start_iter, args.iters):
            if preempted['sig'] is not None:
                if is_root():
                    if ckpt_writer is not None:
                        ckpt_writer.wait()
                    save_checkpoint(str(log_dir), f'preempt_at_{idx}',
                                    ckpt_tree(idx), hparams=hparams,
                                    keep_last=True)
                    print(f'signal {preempted["sig"]}: checkpoint written '
                          f'at iter {idx}; restart with --auto_resume, or '
                          f'--dalle_path {log_dir}/weights/last')
                return
            batch = next(batches)
            feed = {'text': np.asarray(batch['text']),
                    'target': np.asarray(batch['target'])}
            if language_model is not None:
                feed['text'] = language_model(batch['description'])
            if model.cfg.num_visuals > 0 and 'visual' in batch:
                feed['visual'] = np.asarray(batch['visual'])
            if args.negvc and 'text_neg' in batch:
                feed['text_neg'] = np.asarray(batch['text_neg'])
            if args.negvc and 'visual_neg' in batch:
                feed['visual_neg'] = np.asarray(batch['visual_neg'])

            if profile_dir and idx == start_iter + 10 and is_root():
                jax.profiler.start_trace(profile_dir)
            k = jax.random.fold_in(base_key, idx)
            state, metrics = step_fn(state, feed, k)
            if profile_dir and idx == start_iter + 15 and is_root():
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), metrics)
                jax.profiler.stop_trace()

            # failure detection (reference has none, SURVEY.md §5): a
            # non-finite loss aborts with an emergency checkpoint instead of
            # silently corrupting the run
            if idx % args.log_every == 0:
                loss_now = float(metrics['loss'])
                if not np.isfinite(loss_now):
                    if is_root():
                        if ckpt_writer is not None:
                            ckpt_writer.wait()
                        save_checkpoint(str(log_dir), f'nan_at_{idx}',
                                        ckpt_tree(idx),
                                        hparams=hparams, keep_last=False)
                    raise FloatingPointError(
                        f'non-finite loss {loss_now} at iter {idx}; emergency '
                        f'checkpoint written under {log_dir}/weights/')

            if is_root() and (idx % args.log_every == 0):
                m = {k: float(v) for k, v in metrics.items()}
                line = (f'iter {idx} loss {m["loss"]:.4f} '
                        f'msm {m["loss_msm"]:.4f} rel {m["loss_rel"]:.4f} '
                        f'vid {m["loss_vid"]:.4f} gnorm {m["grad_norm"]:.3f} '
                        f'({time.time() - t0:.1f}s)')
                print(line)
                with open(log_path, 'a') as f:
                    f.write(line + '\n')

            if is_root() and idx and (idx % args.save_every_n_steps == 0):
                if ckpt_writer is not None:
                    ckpt_writer.submit(str(log_dir), idx, ckpt_tree(idx),
                                       hparams=hparams)
                else:
                    save_checkpoint(str(log_dir), idx, ckpt_tree(idx),
                                    hparams=hparams)
                if getattr(args, 'keep_n_checkpoints', 0) > 0:
                    # safe alongside an in-flight async write: that write
                    # targets the NEWEST numeric dir, which prune
                    # (keep_n >= 1) never deletes, and 'last' is exempt
                    from mmvid_tpu.utils.checkpoint import prune_checkpoints
                    prune_checkpoints(str(log_dir),
                                      args.keep_n_checkpoints)

            if is_root() and idx and (idx % args.sample_every == 0) \
                    and not args.ar:
                from mmvid_tpu.utils.viz import visualize_train
                model.params = jax.device_get(state.params)
                k = jax.random.fold_in(viz_key, idx)
                visualize_train(
                    model, batch, k, str(log_sample_dir), idx,
                    n_sample=args.n_sample,
                    n_per_sample=min(args.n_per_sample, 2),
                    mask_predict_steps=args.mask_predict_steps[0],
                    vc_mode=args.vc_mode, rand_visual=args.rand_visual,
                    webpage=webpage, mp_config=args.mp_config)
    finally:
        # restore prior dispositions on EVERY exit (normal completion,
        # preemption return, or an abort raise) so handlers never leak
        # into the caller (in-process driver tests run main_worker
        # repeatedly)
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)

    if is_root():
        if ckpt_writer is not None:
            ckpt_writer.wait()
        save_checkpoint(str(log_dir), args.iters, ckpt_tree(args.iters),
                        hparams=hparams)
        print('training done')


if __name__ == '__main__':
    main()
