"""generate.py serving CLI end-to-end with a tiny checkpoint."""

import importlib.util
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f'mmvid_repo_{name}', os.path.join(REPO, f'{name}.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generate_cli_end_to_end(tmp_path):
    from mmvid_tpu.models.bert import BertConfig, BertCore
    from mmvid_tpu.models.clip import ClipStackConfig
    from mmvid_tpu.utils.checkpoint import save_checkpoint

    cfg = BertConfig(dim=64, num_text_tokens=49408, text_seq_len=12,
                     num_visuals=0, num_targets=2, num_image_tokens=1024,
                     image_fmap_size=2, image_size=32,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    core = BertCore(cfg)
    params = core.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 12), jnp.int32), None,
                       jnp.zeros((1, cfg.target_seq_len), jnp.int32)
                       )['params']
    save_checkpoint(str(tmp_path / 'run'), 1,
                    {'step': 1, 'params': params},
                    hparams={'dim': 64, 'text_seq_len': 12,
                             'num_targets': 2, 'num_visuals': 0,
                             'image_size': 32,
                             'which_transformer': 'custom:64:2:2'})

    gen = _load('generate')
    prompts_file = tmp_path / 'prompts.txt'
    prompts_file.write_text('a person is talking\na man smiles\n')
    args = gen.parse_args([
        '--dalle_path', str(tmp_path / 'run' / 'weights' / '1'),
        '--prompt_file', str(prompts_file),
        '--out_dir', str(tmp_path / 'out'),
        '--batch_size', '2', '--mask_predict_steps', '2',
        '--format', 'png'])
    gen.main(args)

    pngs = sorted((tmp_path / 'out').glob('*.png'))
    txts = sorted((tmp_path / 'out').glob('*.txt'))
    assert len(pngs) == 2 and len(txts) == 2
    assert txts[0].read_text() == 'a person is talking'


def test_generate_cli_int8(tmp_path):
    """--int8 serving path: calibrates on startup and produces videos."""
    from mmvid_tpu.models.bert import BertConfig, BertCore
    from mmvid_tpu.models.clip import ClipStackConfig
    from mmvid_tpu.utils.checkpoint import save_checkpoint

    cfg = BertConfig(dim=64, num_text_tokens=49408, text_seq_len=12,
                     num_visuals=0, num_targets=2, num_image_tokens=1024,
                     image_fmap_size=2, image_size=32,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    core = BertCore(cfg)
    params = core.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 12), jnp.int32), None,
                       jnp.zeros((1, cfg.target_seq_len), jnp.int32)
                       )['params']
    save_checkpoint(str(tmp_path / 'run'), 1,
                    {'step': 1, 'params': params},
                    hparams={'dim': 64, 'text_seq_len': 12,
                             'num_targets': 2, 'num_visuals': 0,
                             'image_size': 32,
                             'which_transformer': 'custom:64:2:2'})

    gen = _load('generate')
    args = gen.parse_args([
        '--dalle_path', str(tmp_path / 'run' / 'weights' / '1'),
        '--prompts', 'a person is talking',
        '--out_dir', str(tmp_path / 'out'),
        '--batch_size', '1', '--mask_predict_steps', '2',
        '--format', 'png', '--int8'])
    gen.main(args)
    assert len(list((tmp_path / 'out').glob('*.png'))) == 1


def test_generate_cli_ar_spec(tmp_path, monkeypatch):
    """--ar --spec K: speculative AR serving end-to-end (exactness is
    proven in test_artv_spec.py; this drives the CLI wiring)."""
    from mmvid_tpu.models.artv import ArtvConfig, ArtvCore
    from mmvid_tpu.models.clip import ClipStackConfig
    from mmvid_tpu.utils.checkpoint import save_checkpoint

    # setenv first so monkeypatch records the original (absent) state and
    # teardown removes the value gen.main sets; then start clean
    monkeypatch.setenv('MMVID_ARTV_SPEC', '0')
    os.environ.pop('MMVID_ARTV_SPEC')
    # factories.get_dalle forces num_visuals>=1 for --ar (the reference's
    # ARTV always carries a visual branch), so the checkpoint must too
    cfg = ArtvConfig(dim=64, num_text_tokens=49408, text_seq_len=12,
                     num_visuals=1, num_targets=2, num_image_tokens=1024,
                     image_fmap_size=2, image_size=32,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    core = ArtvCore(cfg)
    params = core.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 12), jnp.int32),
                       jnp.zeros((1, cfg.visual_seq_len), jnp.int32),
                       jnp.zeros((1, cfg.target_seq_len), jnp.int32)
                       )['params']
    save_checkpoint(str(tmp_path / 'run'), 1,
                    {'step': 1, 'params': params},
                    hparams={'dim': 64, 'text_seq_len': 12,
                             'num_targets': 2, 'num_visuals': 1,
                             'image_size': 32,
                             'which_transformer': 'custom:64:2:2'})

    gen = _load('generate')
    common = ['--dalle_path', str(tmp_path / 'run' / 'weights' / '1'),
              '--prompts', 'a person is talking',
              '--out_dir', str(tmp_path / 'out'),
              '--batch_size', '1', '--format', 'png']
    with pytest.raises(SystemExit):
        gen.main(gen.parse_args(common + ['--spec', '4']))       # no --ar
    with pytest.raises(SystemExit):
        gen.main(gen.parse_args(common + ['--ar', '--spec', '4',
                                          '--int8']))
    gen.main(gen.parse_args(common + ['--ar', '--spec', '4']))
    assert len(list((tmp_path / 'out').glob('*.png'))) == 1
    assert os.environ.get('MMVID_ARTV_SPEC') == '4'


def _tiny_artv_ckpt(tmp_path):
    from mmvid_tpu.models.artv import ArtvConfig, ArtvCore
    from mmvid_tpu.models.clip import ClipStackConfig
    from mmvid_tpu.utils.checkpoint import save_checkpoint

    cfg = ArtvConfig(dim=64, num_text_tokens=49408, text_seq_len=12,
                     num_visuals=1, num_targets=2, num_image_tokens=1024,
                     image_fmap_size=2, image_size=32,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    core = ArtvCore(cfg)
    params = core.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 12), jnp.int32),
                       jnp.zeros((1, cfg.visual_seq_len), jnp.int32),
                       jnp.zeros((1, cfg.target_seq_len), jnp.int32)
                       )['params']
    save_checkpoint(str(tmp_path / 'run'), 1,
                    {'step': 1, 'params': params},
                    hparams={'dim': 64, 'text_seq_len': 12,
                             'num_targets': 2, 'num_visuals': 1,
                             'image_size': 32,
                             'which_transformer': 'custom:64:2:2'})
    return str(tmp_path / 'run' / 'weights' / '1')


def test_generate_cli_refuses_spec_force(tmp_path, monkeypatch):
    """Serving refuses the bench-only MMVID_ARTV_SPEC_FORCE=1 ceiling knob
    (accepts all drafts -> garbage output, artv_spec.py) unless
    --bench_unsafe opts in — same pattern as training's serving-only-flag
    guard (training.py)."""
    ckpt = _tiny_artv_ckpt(tmp_path)
    monkeypatch.setenv('MMVID_ARTV_SPEC', '0')
    os.environ.pop('MMVID_ARTV_SPEC')
    monkeypatch.setenv('MMVID_ARTV_SPEC_FORCE', '1')
    gen = _load('generate')
    common = ['--dalle_path', ckpt, '--prompts', 'a person is talking',
              '--out_dir', str(tmp_path / 'out'),
              '--batch_size', '1', '--format', 'png']
    with pytest.raises(SystemExit, match='bench-only'):
        gen.main(gen.parse_args(common + ['--ar', '--spec', '2']))
    # opt-in allows it through (bench ceiling via the CLI)
    gen.main(gen.parse_args(common + ['--ar', '--spec', '2',
                                      '--bench_unsafe']))
    assert len(list((tmp_path / 'out').glob('*.png'))) == 1


def test_generate_cli_spec_reports_acceptance(tmp_path, monkeypatch,
                                              capsys):
    """--spec runs print the realised tokens-per-chunk acceptance so the
    flag decision is observable on the served weights (VERDICT r3 #2)."""
    ckpt = _tiny_artv_ckpt(tmp_path)
    monkeypatch.setenv('MMVID_ARTV_SPEC', '0')
    os.environ.pop('MMVID_ARTV_SPEC')
    gen = _load('generate')
    gen.main(gen.parse_args(
        ['--dalle_path', ckpt, '--prompts', 'a person is talking',
         '--out_dir', str(tmp_path / 'out'), '--batch_size', '1',
         '--format', 'png', '--ar', '--spec', '2']))
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if 'spec acceptance:' in l]
    assert line, out
    tpc = float(line[0].split('spec acceptance:')[1].split()[0])
    # n_loop/steps is bounded by [1, k+1] by construction
    assert 1.0 <= tpc <= 3.0, line[0]


def test_test_driver_refuses_spec_force(monkeypatch):
    """test.py refuses MMVID_ARTV_SPEC_FORCE=1 without --bench_unsafe,
    before any checkpoint/model work."""
    import types
    monkeypatch.setenv('MMVID_ARTV_SPEC_FORCE', '1')
    test_mod = _load('test')
    args = types.SimpleNamespace(bench_unsafe=False)
    with pytest.raises(SystemExit, match='bench-only'):
        test_mod.main_worker(args)
