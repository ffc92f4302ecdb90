"""CLI compatibility: every shipped recipe's flag set must parse and
produce the derived config the reference computes."""

import os
import re
import shlex
from pathlib import Path

import pytest

from mmvid_tpu.config import process_args

pytestmark = pytest.mark.quick

SCRIPTS = Path(__file__).resolve().parent.parent / 'scripts' / 'mmvoxceleb'


def _extract_argv(sh_path: Path):
    text = sh_path.read_text().replace('\\\n', ' ')
    for line in text.splitlines():
        m = re.match(r'\s*python3?\s+(train|test)\.py\s+(.*)', line)
        if m:
            return m.group(1), shlex.split(m.group(2))
    raise AssertionError(f'no python invocation in {sh_path}')


ALL_SCRIPTS = sorted(SCRIPTS.glob('*/*.sh'))


@pytest.mark.parametrize('script', ALL_SCRIPTS,
                         ids=[f'{p.parent.name}/{p.name}'
                              for p in ALL_SCRIPTS])
def test_recipe_flags_parse(script):
    driver, argv = _extract_argv(script)
    args = process_args(train=(driver == 'train'), argv=argv)
    assert args.image_text_folder
    assert isinstance(args.mp_config, dict) and args.mp_config['T'] > 0
    if driver == 'train':
        # normalized strategy probabilities
        assert abs(sum(args.msm_strategy_prob) - 1.0) < 1e-6
    if args.visual:
        assert args.num_visuals >= 1
    else:
        assert args.num_visuals == 0  # num_visuals *= visual


def test_ar_mode_overrides():
    args = process_args(train=True, argv=[
        '--image_text_folder', 'x', '--ar', '--num_visuals', '2',
        '--mask_predict_steps', '5', '10'])
    assert args.beta_msm == 1.0
    assert args.mask_predict_steps == [0]
    assert args.num_visuals == 0 * 2 or args.num_visuals >= 1
    # visual flag off: num_visuals *= 0 then AR forces >= 1
    assert args.num_visuals == 1
