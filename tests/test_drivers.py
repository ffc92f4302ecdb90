"""End-to-end driver tests: train.py + test.py CLI paths on a synthetic
dataset with a tiny custom backbone."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load(name):
    """Load this repo's train.py/test.py by path: other tests put
    /root/reference on sys.path[0], which also has train.py/test.py."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f'mmvid_repo_{name}', os.path.join(REPO, f'{name}.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def data_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp('driver') / 'mmvox'
    rng = np.random.RandomState(0)
    for i in range(18):
        key = f'id{i:05d}#c{i}#000'
        d = root / 'video' / key
        d.mkdir(parents=True)
        for j in range(10):
            arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f'{j:03d}.png')
        (root / 'txt').mkdir(exist_ok=True)
        (root / 'txt' / f'{key}.txt').write_text(
            f'a person number {i} is talking\n')
    return root


def _train_args(data_tree, tmp_path, extra=()):
    from mmvid_tpu.config import process_args
    argv = ([
        '--image_text_folder', str(data_tree),
        '--dataset', 'video_text',
        '--name', 'tiny_run', '--log_root', str(tmp_path / 'logs'),
        '--batch_size', '2', '--iters', '3',
        '--which_transformer', 'custom:64:2:2', '--dim', '64',
        '--text_seq_len', '12', '--num_targets', '2', '--num_visuals', '0',
        '--frame_num', '2', '--frame_step', '2', '--image_size', '32',
        '--save_every_n_steps', '2', '--log_every', '1',
        '--sample_every', '100000', '--num_workers', '2',
        '--beta_rel', '0.0', '--beta_vid', '0.0',
        '--lr_scheduler_warmup', '2',
    ] + list(extra))
    return process_args(train=True, argv=argv)


def test_train_driver_end_to_end(data_tree, tmp_path):
    train_mod = _load('train')
    args = _train_args(data_tree, tmp_path)
    train_mod.main_worker(args)

    log_dir = tmp_path / 'logs' / 'tiny_run'
    assert (log_dir / 'log.txt').exists()
    assert (log_dir / 'weights' / '3').exists()
    assert (log_dir / 'weights' / 'last').exists()
    line = (log_dir / 'log.txt').read_text().splitlines()[0]
    assert 'loss' in line and 'nan' not in line


def test_train_driver_artv(data_tree, tmp_path):
    train_mod = _load('train')
    args = _train_args(data_tree, tmp_path,
                       extra=['--ar', '--num_visuals', '1', '--visual'])
    args.name = 'tiny_ar'
    train_mod.main_worker(args)
    log = (tmp_path / 'logs' / 'tiny_ar' / 'log.txt').read_text()
    assert 'loss' in log and 'nan' not in log


def test_test_driver_sampling(data_tree, tmp_path):
    train_mod = _load('train')
    test_mod = _load('test')
    from mmvid_tpu.config import process_args

    args = _train_args(data_tree, tmp_path)
    train_mod.main_worker(args)

    argv = [
        '--image_text_folder', str(data_tree),
        '--dataset', 'video_text',
        '--name', 'tiny_run', '--log_root', str(tmp_path / 'logs'),
        '--batch_size', '2',
        '--which_transformer', 'custom:64:2:2', '--dim', '64',
        '--text_seq_len', '12', '--num_targets', '2', '--num_visuals', '0',
        '--frame_num', '2', '--frame_step', '2', '--image_size', '32',
        '--n_per_sample', '1', '--mask_predict_steps', '2',
        '--num_workers', '2', '--use_html',
    ]
    targs = process_args(train=False, argv=argv)
    test_mod.main_worker(targs)
    log_dir = tmp_path / 'logs' / 'tiny_run'
    samples = list((log_dir / 'samples').glob('*.png'))
    assert samples, 'no sample grids written'
    assert (log_dir / 'web' / 'index.html').exists()


def test_test_driver_artv_sampling(data_tree, tmp_path):
    """--ar end to end: train 3 iters, then KV-cached sampling grids."""
    train_mod = _load('train')
    test_mod = _load('test')
    from mmvid_tpu.config import process_args

    args = _train_args(data_tree, tmp_path,
                       extra=['--ar', '--num_visuals', '1', '--visual'])
    args.name = 'tiny_ar2'
    train_mod.main_worker(args)

    argv = [
        '--image_text_folder', str(data_tree),
        '--dataset', 'video_text',
        '--name', 'tiny_ar2', '--log_root', str(tmp_path / 'logs'),
        '--batch_size', '2', '--ar', '--visual', '--num_visuals', '1',
        '--which_transformer', 'custom:64:2:2', '--dim', '64',
        '--text_seq_len', '12', '--num_targets', '2',
        '--frame_num', '2', '--frame_step', '2', '--image_size', '32',
        '--n_per_sample', '1', '--num_workers', '2',
    ]
    targs = process_args(train=False, argv=argv)
    test_mod.main_worker(targs)
    samples = list((tmp_path / 'logs' / 'tiny_ar2' / 'samples'
                    ).glob('*.png'))
    assert samples, 'no ARTV sample grids written'

    # --spec K routes sampling through the exact speculative decode (the
    # --spec-without---ar guard is exercised in test_generate_cli.py;
    # here the checkpoint's frozen hparams force ar=True regardless)
    import os
    assert 'MMVID_ARTV_SPEC' not in os.environ
    try:
        targs2 = process_args(train=False, argv=argv + ['--spec', '4'])
        targs2.name = 'tiny_ar2'
        test_mod.main_worker(targs2)
        assert os.environ.get('MMVID_ARTV_SPEC') == '4'
    finally:
        os.environ.pop('MMVID_ARTV_SPEC', None)


def test_test_driver_long_mode(data_tree, tmp_path):
    train_mod = _load('train')
    test_mod = _load('test')
    from mmvid_tpu.config import process_args

    args = _train_args(data_tree, tmp_path)
    train_mod.main_worker(args)

    argv = [
        '--image_text_folder', str(data_tree),
        '--dataset', 'video_text',
        '--name', 'tiny_run', '--log_root', str(tmp_path / 'logs'),
        '--batch_size', '1',
        '--which_transformer', 'custom:64:2:2', '--dim', '64',
        '--text_seq_len', '12', '--num_targets', '2', '--num_visuals', '0',
        '--frame_num', '2', '--frame_step', '2', '--image_size', '32',
        '--eval_mode', 'long', '--long_mode', 'long',
        '--t_repeat', '3', '--t_overlap', '1',
        '--mask_predict_steps', '2', '--num_workers', '2',
    ]
    targs = process_args(train=False, argv=argv)
    video = test_mod.main_worker(targs)
    # 2 frames + 2 chunks x 1 novel frame each
    assert video.shape[1] == 2 + 2 * 1


def test_train_driver_preemption_checkpoint(data_tree, tmp_path):
    """SIGTERM mid-training: the loop finishes the in-flight step, writes a
    resumable preempt checkpoint, and returns cleanly (TPU fleet schedulers
    deliver SIGTERM before reclaiming capacity)."""
    import signal

    import mmvid_tpu.training as tr

    train_mod = _load('train')
    args = _train_args(data_tree, tmp_path)
    args.name = 'tiny_preempt'
    args.iters = 50  # far more than will run

    orig = tr.jit_train_step
    calls = {'n': 0}

    def patched(model, tc, mesh=None, **kw):
        step = orig(model, tc, mesh=mesh, **kw)

        def wrapper(*a, **k):
            calls['n'] += 1
            if calls['n'] == 2:  # mid-training, after handlers installed
                signal.raise_signal(signal.SIGTERM)
            return step(*a, **k)

        wrapper.shard_state = step.shard_state
        return wrapper

    tr.jit_train_step = patched
    try:
        train_mod.main_worker(args)
    finally:
        tr.jit_train_step = orig

    assert calls['n'] < 50, 'SIGTERM did not stop the loop'
    log_dir = tmp_path / 'logs' / 'tiny_preempt'
    pre = list((log_dir / 'weights').glob('preempt_at_*'))
    assert pre, 'no preemption checkpoint written'
    # the checkpoint must be resumable: it restores params + opt state
    from mmvid_tpu.utils.checkpoint import load_checkpoint
    tree, _hparams = load_checkpoint(str(pre[0]))
    assert 'params' in tree and 'opt_state' in tree and 'step' in tree
    # and the default SIGTERM disposition is restored
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL


def test_train_driver_async_checkpoint(data_tree, tmp_path):
    """--async_ckpt: periodic saves overlap training on a worker thread
    and produce the same loadable checkpoints as the sync path."""
    train_mod = _load('train')
    args = _train_args(data_tree, tmp_path, extra=['--async_ckpt'])
    args.name = 'tiny_async'
    train_mod.main_worker(args)

    log_dir = tmp_path / 'logs' / 'tiny_async'
    assert (log_dir / 'weights' / '2').exists()   # periodic (async)
    assert (log_dir / 'weights' / '3').exists()   # final (sync)
    from mmvid_tpu.utils.checkpoint import load_checkpoint
    tree, hparams = load_checkpoint(str(log_dir / 'weights' / '2'))
    assert 'params' in tree and 'opt_state' in tree and tree['step'] == 2
    assert hparams['async_ckpt'] is True


def test_test_driver_int8_sampling(data_tree, tmp_path):
    """test.py --int8: quantize-for-serving path through the test driver."""
    train_mod = _load('train')
    test_mod = _load('test')
    from mmvid_tpu.config import process_args

    args = _train_args(data_tree, tmp_path)
    args.name = 'tiny_int8'
    train_mod.main_worker(args)

    argv = [
        '--image_text_folder', str(data_tree),
        '--dataset', 'video_text',
        '--name', 'tiny_int8', '--log_root', str(tmp_path / 'logs'),
        '--batch_size', '2',
        '--which_transformer', 'custom:64:2:2', '--dim', '64',
        '--text_seq_len', '12', '--num_targets', '2', '--num_visuals', '0',
        '--frame_num', '2', '--frame_step', '2', '--image_size', '32',
        '--n_per_sample', '1', '--mask_predict_steps', '2',
        '--num_workers', '2', '--int8',
    ]
    targs = process_args(train=False, argv=argv)
    test_mod.main_worker(targs)
    samples = list((tmp_path / 'logs' / 'tiny_int8' / 'samples'
                    ).glob('*.png'))
    assert samples, 'no int8 sample grids written'


def test_train_driver_auto_resume(data_tree, tmp_path):
    """--auto_resume: a restarted job (same command line) picks up its own
    weights/last, restoring params + opt state + schedule position."""
    train_mod = _load('train')
    args = _train_args(data_tree, tmp_path)
    args.name = 'tiny_resume'
    train_mod.main_worker(args)              # iters 0..2, final save at 3

    args2 = _train_args(data_tree, tmp_path, extra=['--auto_resume'])
    args2.name = 'tiny_resume'
    args2.iters = 5
    train_mod.main_worker(args2)             # must resume at iter 3

    log = (tmp_path / 'logs' / 'tiny_resume' / 'log.txt').read_text()
    iters_logged = [int(l.split()[1]) for l in log.splitlines()
                    if l.startswith('iter ')]
    assert 3 in iters_logged and 4 in iters_logged
    # the restart did NOT replay 0..2 after the first run's pass
    assert iters_logged.count(0) == 1
    assert (tmp_path / 'logs' / 'tiny_resume' / 'weights' / '5').exists()


def test_train_driver_checkpoint_retention(data_tree, tmp_path):
    """--keep_n_checkpoints prunes old numeric dirs; last is kept."""
    train_mod = _load('train')
    args = _train_args(data_tree, tmp_path)
    args.name = 'tiny_prune'
    args.iters = 7
    args.save_every_n_steps = 1
    args.keep_n_checkpoints = 2
    train_mod.main_worker(args)

    weights = tmp_path / 'logs' / 'tiny_prune' / 'weights'
    numeric = sorted(int(d.name) for d in weights.iterdir()
                     if d.name.isdigit())
    # final save at 7 plus the 2 newest periodic ones survive at most
    assert len(numeric) <= 3 and max(numeric) == 7
    assert 1 not in numeric and 2 not in numeric
    assert (weights / 'last').exists()
