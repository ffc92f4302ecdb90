"""Recipe EXECUTION smoke tests: push a shipped recipe's exact argv
through the real train.py/test.py mains (not just the parser).

test_cli_compat.py proves every `scripts/mmvoxceleb/*/*.sh` flag set
parses; these tests close the remaining gap — a flag that parses but
misroutes at the driver level (wrong dataset class, dropped mp_config
key) only shows up when the recipe's argv actually drives a training
step and a sampling pass.  The recipe argv is taken verbatim from the
.sh file (the reference's only integration surface,
/root/reference/scripts/mmvoxceleb/text_to_video/{train,test}.sh) and
overridden ONLY by APPENDING flags (paths, sizes, iteration counts) so
argparse last-wins keeps every recipe flag routing through the config.
"""

import os
import re
import shlex
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRIPTS = Path(REPO) / 'scripts' / 'mmvoxceleb'


def _load(name):
    """Load this repo's train.py/test.py by path (other tests put
    /root/reference on sys.path[0], which also has train.py/test.py)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f'mmvid_repo_recipe_{name}', os.path.join(REPO, f'{name}.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _recipe_argv(script: Path):
    text = script.read_text().replace('\\\n', ' ')
    for line in text.splitlines():
        m = re.match(r'\s*python3?\s+(train|test)\.py\s+(.*)', line)
        if m:
            return shlex.split(m.group(2))
    raise AssertionError(f'no python invocation in {script}')


@pytest.fixture(scope='module')
def data_tree(tmp_path_factory):
    """Synthetic Multimodal-VoxCeleb-shaped tree long enough for the
    recipe's own clip geometry (frame_num 8, frame_step 4 needs >= 29
    frames per video)."""
    root = tmp_path_factory.mktemp('recipe') / 'mmvox'
    rng = np.random.RandomState(0)
    for i in range(6):
        key = f'id{i:05d}#c{i}#000'
        d = root / 'video' / key
        d.mkdir(parents=True)
        for j in range(32):
            arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f'{j:03d}.png')
        (root / 'txt').mkdir(exist_ok=True)
        (root / 'txt' / f'{key}.txt').write_text(
            f'a person number {i} is talking\n')
    return root


# appended AFTER the recipe argv: paths, tiny sizes, short runs only —
# argparse keeps the recipe's values for everything else
def _shrink(data_tree, tmp_path):
    return [
        '--image_text_folder', str(data_tree),
        '--log_root', str(tmp_path / 'logs'),
        '--vae_path', '',                       # no released ckpt in-env
        '--which_transformer', 'custom:64:2:2', '--dim', '64',
        '--image_size', '32',
        '--batch_size', '2', '--num_workers', '2',
    ]


def test_text_to_video_train_recipe_executes(data_tree, tmp_path):
    """train.sh argv + appended shrink flags -> 3 real SPMD steps with
    the recipe's full loss mix (beta_msm 7, default REL/VID at 0.5,
    rel_no_fully_masked, dropout_vc 0.4), checkpoints + log appear."""
    argv = _recipe_argv(SCRIPTS / 'text_to_video' / 'train.sh')
    argv += _shrink(data_tree, tmp_path)
    argv += ['--iters', '3', '--save_every_n_steps', '3',
             '--log_every', '1', '--sample_every', '100000']

    from mmvid_tpu.config import process_args
    args = process_args(train=True, argv=argv)
    # the recipe's own flags must still be in force after the overrides
    assert args.beta_msm == 7.0 and args.rel_no_fully_masked
    assert args.frame_num == 8 and args.frame_step == 4
    assert args.mask_predict_steps == [10, 20, 30]
    assert args.dataset == 'video_text' and args.text_seq_len == 50

    train_mod = _load('train')
    train_mod.main_worker(args)

    log_dir = tmp_path / 'logs' / args.name
    assert (log_dir / 'weights' / '3').exists()
    assert (log_dir / 'weights' / 'last').exists()
    log = (log_dir / 'log.txt').read_text()
    assert 'loss' in log and 'nan' not in log


def test_text_to_video_test_recipe_executes(data_tree, tmp_path):
    """test.sh argv (checkpoint appended to override the released-name
    --dalle_path) -> mask-predict sampling grids via the real test.py
    main; checkpoint hparams override the CLI exactly as the reference
    does (test.py:133-153)."""
    # train 2 quick steps to make a checkpoint the recipe can load
    train_argv = _recipe_argv(SCRIPTS / 'text_to_video' / 'train.sh')
    train_argv += _shrink(data_tree, tmp_path)
    train_argv += ['--iters', '2', '--save_every_n_steps', '2',
                   '--log_every', '1', '--sample_every', '100000',
                   '--beta_rel', '0', '--beta_vid', '0']
    from mmvid_tpu.config import process_args
    targs = process_args(train=True, argv=train_argv)
    _load('train').main_worker(targs)
    ckpt = tmp_path / 'logs' / targs.name / 'weights' / 'last'
    assert ckpt.exists()

    argv = _recipe_argv(SCRIPTS / 'text_to_video' / 'test.sh')
    argv += _shrink(data_tree, tmp_path)
    argv += ['--dalle_path', str(ckpt), '--iters', '1',
             '--n_per_sample', '1', '--mp_T', '2']
    args = process_args(train=False, argv=argv)
    # recipe flags still in force
    assert args.frame_num == 8 and args.frame_step == 4
    assert args.batch_size == 2 and args.use_html

    _load('test').main_worker(args)

    log_dir = tmp_path / 'logs' / (args.name + args.name_suffix)
    samples = list(log_dir.rglob('*.png'))
    assert samples, 'recipe test.sh run produced no sample grids'
