"""CI dry-run of the one-command real-weight gate
(scripts/validate_weights.py): synthetic dalle.pt with embedded VQGAN
weights, random I3D, tiny eval — the whole chain must run and print the
verdict; each stage must fail loudly with its own message."""

import importlib.util
import os
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script():
    spec = importlib.util.spec_from_file_location(
        'validate_weights', os.path.join(REPO, 'scripts',
                                         'validate_weights.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def synthetic_ckpt(tmp_path_factory):
    """Tiny dalle.pt (custom:64:2:2 backbone, 32px, embedded VQGAN) + a
    matching 4-clip dataset tree."""
    import jax
    import jax.numpy as jnp

    from mmvid_tpu.models.bert import BertConfig, BertCore
    from mmvid_tpu.models.clip import ClipStackConfig
    from mmvid_tpu.models.vqgan import VQGanVAE
    from mmvid_tpu.utils.torch_compat import save_dalle_checkpoint

    root = tmp_path_factory.mktemp('validate')

    hparams = {'dim': 64, 'text_seq_len': 12, 'num_targets': 2,
               'num_visuals': 0, 'which_transformer': 'custom:64:2:2',
               'image_size': 32, 'insert_sep': False,
               'use_separate_visual_emb': False,
               'fixed_language_model': None, 'text_emb_bottleneck': None,
               'loss_img_weight': 7, 'ar': False}
    # default VQGanConfig at 32px -> num_layers 4 -> 2x2 fmap
    vae = VQGanVAE(image_size=32)
    cfg = BertConfig(dim=64, num_text_tokens=49408, text_seq_len=12,
                     num_visuals=0, num_targets=2, num_image_tokens=1024,
                     image_fmap_size=2, image_size=32,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    core = BertCore(cfg)
    params = core.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 12), jnp.int32), None,
                       jnp.zeros((1, cfg.target_seq_len), jnp.int32)
                       )['params']
    ckpt_path = root / 'dalle.pt'
    save_dalle_checkpoint(str(ckpt_path), params=params, iter=5,
                          hparams=hparams, vae_params=vae.params)

    data = root / 'mmvox'
    rng = np.random.RandomState(1)
    for i in range(4):
        key = f'id{i:05d}#c{i}#000'
        d = data / 'video' / key
        d.mkdir(parents=True)
        for j in range(8):
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)
                            ).save(d / f'{j:03d}.png')
        (data / 'txt').mkdir(exist_ok=True)
        (data / 'txt' / f'{key}.txt').write_text(f'person {i} talking\n')
    return str(ckpt_path), str(data)


@pytest.fixture(scope='module')
def synthetic_ar_ckpt(tmp_path_factory):
    """Tiny ART-V checkpoint (native orbax layout + taming-format vae
    .ckpt) for the --spec probe: 32px VQGAN -> 2x2 fmap, so spec_k <= 4."""
    import jax
    import jax.numpy as jnp
    import torch

    from mmvid_tpu.models.artv import ArtvConfig, ArtvCore
    from mmvid_tpu.models.clip import ClipStackConfig
    from mmvid_tpu.models.vqgan import VQGanVAE
    from mmvid_tpu.utils.checkpoint import save_checkpoint
    from mmvid_tpu.utils.torch_compat import vqgan_params_to_torch

    root = tmp_path_factory.mktemp('validate_ar')
    hparams = {'dim': 64, 'text_seq_len': 12, 'num_targets': 2,
               'num_visuals': 0, 'which_transformer': 'custom:64:2:2',
               'image_size': 32, 'insert_sep': False,
               'use_separate_visual_emb': False,
               'fixed_language_model': None, 'text_emb_bottleneck': None,
               'loss_img_weight': 7, 'ar': True}
    # must match get_dalle's AR rebuild: num_visuals forced to >= 1
    cfg = ArtvConfig(dim=64, num_text_tokens=49408, text_seq_len=12,
                     num_visuals=1, num_targets=2, num_image_tokens=1024,
                     image_fmap_size=2, image_size=32, loss_img_weight=7,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    core = ArtvCore(cfg)
    params = core.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 12), jnp.int32),
                       jnp.zeros((1, cfg.visual_seq_len), jnp.int32),
                       jnp.zeros((1, cfg.target_seq_len), jnp.int32)
                       )['params']
    save_checkpoint(str(root), 5, {'params': params}, hparams=hparams)

    vae = VQGanVAE(image_size=32)
    sd = vqgan_params_to_torch(vae.params)
    vae_path = root / 'vae.ckpt'
    torch.save({'state_dict': {k: torch.from_numpy(np.ascontiguousarray(v))
                               for k, v in sd.items()}}, str(vae_path))
    return str(root / 'weights' / '5'), str(vae_path)


def test_validate_weights_dry_run(synthetic_ckpt, tmp_path, capsys):
    ckpt, data = synthetic_ckpt
    mod = _load_script()
    rc = mod.main(['--dalle', ckpt, '--data', data,
                   '--dataset', 'video_text',
                   '--eval_num', '2', '--batch_size', '2',
                   '--mask_predict_steps', '2',
                   '--frame_num', '2', '--frame_step', '2',
                   '--allow_random_i3d', '--no_gate',
                   '--out_dir', str(tmp_path / 'out')])
    assert rc == 0
    out = capsys.readouterr().out
    for stage in ('load model checkpoint', 'build VQGAN',
                  'build model + graft weights', 'scan dataset',
                  'FVD ='):
        assert stage in out, f'missing stage marker {stage!r}:\n{out}'
    assert 'DONE (no gate applied)' in out


@pytest.mark.parametrize('pct', [None, '99.9'])
def test_validate_weights_int8_dry_run(synthetic_ckpt, tmp_path, capsys,
                                       pct):
    """--int8 runs the FVD protocol a second time through
    quantize_for_serving (real-data calibration batch) and reports the
    bf16->int8 delta; --int8_percentile selects percentile clipping."""
    ckpt, data = synthetic_ckpt
    mod = _load_script()
    argv = ['--dalle', ckpt, '--data', data,
            '--dataset', 'video_text',
            '--eval_num', '2', '--batch_size', '2',
            '--mask_predict_steps', '2',
            '--frame_num', '2', '--frame_step', '2',
            '--allow_random_i3d', '--no_gate', '--int8',
            '--out_dir', str(tmp_path / 'out')]
    if pct:
        argv += ['--int8_percentile', pct]
    rc = mod.main(argv)
    assert rc == 0
    out = capsys.readouterr().out
    assert 'int8: quantize' in out
    line = [l for l in out.splitlines() if 'int8 FVD =' in l]
    assert line and 'delta' in line[0], out
    assert f'calibration: {pct or "absmax"}' in line[0]
    # both FVD artifacts exist, in separate dirs
    assert (tmp_path / 'out' / 'fvd_score.txt').exists()
    assert (tmp_path / 'out' / 'int8' / 'fvd_score.txt').exists()


def test_validate_weights_spec_probe(synthetic_ckpt, synthetic_ar_ckpt,
                                     tmp_path, capsys):
    """--spec on an ART-V checkpoint: greedy spec-vs-baseline equality is
    re-verified on the loaded weights and the realised acceptance is
    reported with the enable/disable recommendation (the serving docs'
    enable-iff rule, ROADMAP round-5)."""
    _, data = synthetic_ckpt
    ckpt, vae = synthetic_ar_ckpt
    mod = _load_script()
    rc = mod.main(['--dalle', ckpt, '--vae', vae, '--data', data,
                   '--dataset', 'video_text',
                   '--eval_num', '2', '--batch_size', '2',
                   '--frame_num', '2', '--frame_step', '2',
                   '--allow_random_i3d', '--no_gate', '--spec', '2',
                   '--out_dir', str(tmp_path / 'out')])
    assert rc == 0
    out = capsys.readouterr().out
    assert 'spec probe' in out
    assert 'greedy spec == baseline: OK' in out
    assert 'tokens/chunk' in out and 'break-even' in out


def test_validate_weights_spec_probe_requires_ar(synthetic_ckpt, tmp_path,
                                                 capsys):
    """--spec on the BERT mask-predict checkpoint fails at its stage."""
    ckpt, data = synthetic_ckpt
    mod = _load_script()
    with pytest.raises(SystemExit) as exc:
        mod.main(['--dalle', ckpt, '--data', data,
                  '--dataset', 'video_text',
                  '--eval_num', '2', '--batch_size', '2',
                  '--mask_predict_steps', '2',
                  '--frame_num', '2', '--frame_step', '2',
                  '--allow_random_i3d', '--no_gate', '--spec', '2',
                  '--out_dir', str(tmp_path / 'out')])
    assert exc.value.code == 2
    assert 'FAILED at stage "spec probe"' in capsys.readouterr().err


def test_validate_weights_stage_failure(tmp_path, capsys):
    """A missing checkpoint fails at its stage with a named message."""
    mod = _load_script()
    with pytest.raises(SystemExit) as exc:
        mod.main(['--dalle', str(tmp_path / 'missing.pt'),
                  '--data', str(tmp_path), '--allow_random_i3d'])
    assert exc.value.code == 2
    err = capsys.readouterr().err
    assert 'FAILED at stage "load model checkpoint"' in err


def test_validate_weights_requires_i3d(synthetic_ckpt, capsys):
    """Without --i3d and without the CI opt-in, the gate refuses (FVD with
    random I3D must never masquerade as the real number)."""
    ckpt, data = synthetic_ckpt
    mod = _load_script()
    with pytest.raises(SystemExit) as exc:
        mod.main(['--dalle', ckpt, '--data', data,
                  '--dataset', 'video_text'])
    assert exc.value.code == 2
    assert 'load I3D' in capsys.readouterr().err
