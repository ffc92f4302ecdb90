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


@pytest.fixture(scope='module')
def vox_tree(tmp_path_factory):
    """Synthetic Multimodal-VoxCeleb tree for the vox recipe families:
    3 pids x 2 clips (so --attr_mode image+* same-pid sampling has a
    second clip to draw from), 30 frames/clip (frame_num 8, frame_step 4
    needs >= 29), plus the mask/, draw/style1/ and label/ subtrees the
    vox attr_modes read (loader_ext.py:143-274 tree shape)."""
    root = tmp_path_factory.mktemp('recipe_vox') / 'mmvox'
    rng = np.random.RandomState(1)
    for p in range(3):
        for c in range(2):
            key = f'id{p:05d}#c{p}#{c:03d}'
            d = root / 'video' / key
            d.mkdir(parents=True)
            for j in range(30):
                arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f'{j:03d}.png')
            for sub in ('mask', os.path.join('draw', 'style1')):
                d = root / sub / key
                d.mkdir(parents=True)
                for j in range(2):
                    arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                    Image.fromarray(arr).save(d / f'{j:03d}.png')
            (root / 'txt').mkdir(exist_ok=True)
            (root / 'txt' / f'{key}.txt').write_text(
                f'A person number {p} clip {c} is talking\n')
            (root / 'label').mkdir(exist_ok=True)
            label = ['0'] * 40
            label[20] = '1'          # Male
            label[p] = '1'           # distinct per pid -> REL negatives
            (root / 'label' / f'{key}.txt').write_text(','.join(label))
    return root


@pytest.fixture(scope='module')
def roberta_dir(tmp_path_factory):
    """Tiny synthetic roberta-large stand-in (same recipe as
    test_fixed_lm.py) so the text_augment recipe's
    --fixed_language_model path executes without released weights."""
    import json
    import torch
    from transformers import (RobertaConfig, RobertaModel,
                              RobertaTokenizerFast)
    d = tmp_path_factory.mktemp('roberta')
    vocab = {t: i for i, t in enumerate(
        ['<s>', '<pad>', '</s>', '<unk>', '<mask>']
        + list('abcdefghij') + ['person', 'talking', 'Ġ'])}
    (d / 'vocab.json').write_text(json.dumps(vocab))
    (d / 'merges.txt').write_text('#version: 0.2\n')
    tok = RobertaTokenizerFast(vocab_file=str(d / 'vocab.json'),
                               merges_file=str(d / 'merges.txt'))
    tok.save_pretrained(str(d))
    cfg = RobertaConfig(vocab_size=len(vocab), hidden_size=16,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=32, max_position_embeddings=64,
                        pad_token_id=1, bos_token_id=0, eos_token_id=2)
    torch.manual_seed(0)
    RobertaModel(cfg).eval().save_pretrained(str(d))
    return d


# every shipped vox train recipe: (family, attr_mode, vc_mode, num_visuals)
VOX_RECIPES = [
    ('drawing_and_mask', 'draw+mask2', 'mask2_8x8', 2),
    ('image_and_mask', 'image+mask2', 'mask2_8x8', 2),
    ('image_and_video', 'image+video33', 'face2_8x8', 4),
    ('text_and_drawing', 'draw+text_dropout', 'mask_8x8', 1),
    ('text_and_mask', 'mask+text_dropout', 'mask_8x8', 1),
    ('text_and_partial_image', 'image+text_dropout', 'face_8x8', 1),
]


@pytest.mark.parametrize('family,attr_mode,vc_mode,n_vis',
                         VOX_RECIPES, ids=[r[0] for r in VOX_RECIPES])
def test_vox_recipe_train_and_test_execute(vox_tree, tmp_path, family,
                                           attr_mode, vc_mode, n_vis):
    """Each vox family's train.sh argv -> 2 real SPMD steps through
    train.py main (the recipe's attr_mode drives the vox dataset branch,
    its vc_mode drives erase_codebook_face, and a checkpoint lands), then
    the SAME family's test.sh argv through test.py main on that
    checkpoint (--use_cvae sampling surface + the family's vc_mode
    visual-control occlusion at generation).  Covers all 12 vox recipe
    .sh files.  Recipe surface:
    /root/reference/scripts/mmvoxceleb/<family>/{train,test}.sh."""
    from mmvid_tpu.config import process_args
    argv = _recipe_argv(SCRIPTS / family / 'train.sh')
    argv += _shrink(vox_tree, tmp_path)
    # --cvae_path '' drops the env-blocked released cvae ckpt, which would
    # also drop the separate visual embedding a cvae forces (the reference
    # forces use_separate_visual_emb when a cvae is present,
    # dalle_bert.py:330; mmvid.py:49-50 mirrors it) — re-add it explicitly
    # so the checkpoint carries the same param set a cvae-trained one
    # would, and test.sh's --use_cvae resolves against it
    argv += ['--cvae_path', '', '--use_separate_visual_emb',
             '--iters', '2', '--save_every_n_steps', '2',
             '--log_every', '1', '--sample_every', '100000']

    targs = process_args(train=True, argv=argv)
    # the recipe's own routing flags must survive the appended overrides
    assert targs.dataset == 'vox' and targs.attr_mode == attr_mode
    assert targs.vc_mode == vc_mode and targs.num_visuals == n_vis
    assert targs.visual and targs.fullvc
    assert targs.frame_num == 8 and targs.frame_step == 4

    _load('train').main_worker(targs)

    log_dir = tmp_path / 'logs' / targs.name
    ckpt = log_dir / 'weights' / 'last'
    assert (log_dir / 'weights' / '2').exists() and ckpt.exists()
    log = (log_dir / 'log.txt').read_text()
    assert 'loss' in log and 'nan' not in log

    argv = _recipe_argv(SCRIPTS / family / 'test.sh')
    argv += _shrink(vox_tree, tmp_path)
    argv += ['--dalle_path', str(ckpt), '--iters', '1',
             '--n_per_sample', '1', '--n_sample', '1', '--mp_T', '2',
             '--batch_size', '2']
    args = process_args(train=False, argv=argv)
    # every vox test recipe samples through a cvae visual tokenizer with
    # the family's own control geometry
    assert args.use_cvae and args.vc_mode == vc_mode
    assert args.attr_mode == attr_mode and args.visual

    _load('test').main_worker(args)

    test_dir = tmp_path / 'logs' / (args.name + args.name_suffix)
    samples = list(test_dir.rglob('*.png'))
    assert samples, f'{family} test.sh run produced no sample grids'


def test_text_augment_train_recipe_executes(data_tree, roberta_dir,
                                            tmp_path, monkeypatch):
    """text_augment train.sh argv -> 2 steps with the RoBERTa fixed-LM
    text path (batch descriptions -> mean-pooled features -> the model's
    text_feature projection).  Recipe surface:
    /root/reference/scripts/mmvoxceleb/text_augment/train.sh."""
    monkeypatch.setenv('ROBERTA_PATH', str(roberta_dir))
    argv = _recipe_argv(SCRIPTS / 'text_augment' / 'train.sh')
    argv += _shrink(data_tree, tmp_path)
    argv += ['--iters', '2', '--save_every_n_steps', '2',
             '--log_every', '1', '--sample_every', '100000']

    from mmvid_tpu.config import process_args
    args = process_args(train=True, argv=argv)
    assert args.fixed_language_model == 'roberta-large'
    assert args.dataset == 'video_text' and args.num_visuals == 0

    _load('train').main_worker(args)

    log_dir = tmp_path / 'logs' / args.name
    assert (log_dir / 'weights' / '2').exists()
    log = (log_dir / 'log.txt').read_text()
    assert 'loss' in log and 'nan' not in log


def test_text_augment_test_recipe_executes(data_tree, roberta_dir,
                                           tmp_path, monkeypatch):
    """text_augment test.sh argv through test.py main — covers the
    --description prompt override + RoBERTa feature encoding at sampling
    time (test.py:216-222), the only test-recipe surface not exercised by
    the vox/text_to_video execution tests."""
    monkeypatch.setenv('ROBERTA_PATH', str(roberta_dir))
    from mmvid_tpu.config import process_args
    train_argv = _recipe_argv(SCRIPTS / 'text_augment' / 'train.sh')
    train_argv += _shrink(data_tree, tmp_path)
    train_argv += ['--iters', '2', '--save_every_n_steps', '2',
                   '--log_every', '1', '--sample_every', '100000',
                   '--beta_rel', '0', '--beta_vid', '0']
    targs = process_args(train=True, argv=train_argv)
    _load('train').main_worker(targs)
    ckpt = tmp_path / 'logs' / targs.name / 'weights' / 'last'
    assert ckpt.exists()

    argv = _recipe_argv(SCRIPTS / 'text_augment' / 'test.sh')
    argv += _shrink(data_tree, tmp_path)
    argv += ['--dalle_path', str(ckpt), '--iters', '1',
             '--n_per_sample', '1', '--n_sample', '1', '--mp_T', '2',
             '--batch_size', '2']
    args = process_args(train=False, argv=argv)
    assert args.description == 'A girl.'
    assert args.fixed_language_model == 'roberta-large'

    _load('test').main_worker(args)

    log_dir = tmp_path / 'logs' / (args.name + args.name_suffix)
    samples = list(log_dir.rglob('*.png'))
    assert samples, 'text_augment test.sh run produced no sample grids'


@pytest.fixture(scope='module')
def eval_tree(tmp_path_factory):
    """16-clip video_text tree: evaluation.sh pins eval batch_size to 16
    (test.py:49, mirroring the reference test.py:47), and the
    deterministic loader drops the last partial batch, so the quantitative
    eval needs at least one full 16-clip batch."""
    root = tmp_path_factory.mktemp('recipe_eval') / 'mmvox'
    rng = np.random.RandomState(2)
    for i in range(16):
        key = f'id{i:05d}#c{i}#000'
        d = root / 'video' / key
        d.mkdir(parents=True)
        for j in range(30):
            arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f'{j:03d}.png')
        (root / 'txt').mkdir(exist_ok=True)
        (root / 'txt' / f'{key}.txt').write_text(
            f'a person number {i} is talking\n')
    return root


def test_text_to_video_evaluation_recipe_executes(eval_tree, tmp_path,
                                                  monkeypatch):
    """evaluation.sh argv through test.py main — the only shipped recipe
    with --eval_mode eval --eval_metric fvd_prd: one full quantitative
    pass (generate -> on-device ping-pong + I3D embed -> FVD + PRD
    artifacts).  Kinetics I3D weights are env-blocked, so the run opts
    into the random-I3D pipeline mode (MMVID_ALLOW_RANDOM_I3D=1) that
    evaluate() otherwise refuses; scores are pipeline-smoke only.
    Recipe surface:
    /root/reference/scripts/mmvoxceleb/text_to_video/evaluation.sh."""
    from mmvid_tpu.config import process_args
    train_argv = _recipe_argv(SCRIPTS / 'text_to_video' / 'train.sh')
    train_argv += _shrink(eval_tree, tmp_path)
    train_argv += ['--iters', '2', '--save_every_n_steps', '2',
                   '--log_every', '1', '--sample_every', '100000',
                   '--beta_rel', '0', '--beta_vid', '0']
    targs = process_args(train=True, argv=train_argv)
    _load('train').main_worker(targs)
    ckpt = tmp_path / 'logs' / targs.name / 'weights' / 'last'
    assert ckpt.exists()

    monkeypatch.setenv('MMVID_ALLOW_RANDOM_I3D', '1')
    argv = _recipe_argv(SCRIPTS / 'text_to_video' / 'evaluation.sh')
    argv += _shrink(eval_tree, tmp_path)
    argv += ['--dalle_path', str(ckpt),
             '--eval_num', '16', '--mp_T', '2']
    args = process_args(train=False, argv=argv)
    # recipe routing flags survive the appended shrink overrides
    assert args.eval_mode == 'eval' and args.eval_metric == ['fvd_prd']
    assert args.name_suffix == '_eval=fvd'

    results = _load('test').main_worker(args)

    assert np.isfinite(results['fvd'])
    f8, f18 = results['prd']
    assert 0 <= f8 <= 1 and 0 <= f18 <= 1
    metric_dir = tmp_path / 'logs' / (args.name + args.name_suffix) \
        / 'metrics'
    assert (metric_dir / 'fvd_score.txt').exists()
    assert (metric_dir / 'prd_score.txt').exists()
    # the artifact records the true sample count (no silent caps)
    assert 'n_samples = 16' in (metric_dir / 'fvd_score.txt').read_text()


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
