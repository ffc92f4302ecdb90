"""iPER / Shape datasets + dataset prep tools."""

import random

import numpy as np
import pytest
from PIL import Image

from mmvid_tpu.data.iper import IPERDataset
from mmvid_tpu.data.shapes import (
    ShapeAttrDataset,
    ShapeDataset,
    parse_shape_caption,
)
from mmvid_tpu.data.prep import make_label, make_text
from mmvid_tpu.tokenizer import SimpleTokenizer


@pytest.fixture(scope='module')
def tok():
    return SimpleTokenizer()


def _frames(root, key, n=14, size=24):
    d = root / 'video' / key
    d.mkdir(parents=True)
    rng = np.random.RandomState(hash(key) % 2 ** 31)
    for j in range(n):
        Image.fromarray(rng.randint(0, 255, (size, size, 3),
                                    dtype=np.uint8)).save(d / f'{j:03d}.png')


@pytest.fixture(scope='module')
def iper_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp('iper') / 'iper'
    (root / 'txt').mkdir(parents=True)
    for i in range(3):
        key = f'{i:03d}_1_1'
        _frames(root, key)
        (root / 'txt' / f'{key}.txt').write_text(
            f"person {i:03d} dressed in {i} is performing random pose.\n")
    return root


@pytest.fixture(scope='module')
def shape_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp('shape') / 'shapes'
    (root / 'txt').mkdir(parents=True)
    combos = [('small', 'red', 'cube', 'left'),
              ('big', 'blue', 'ball', 'right'),
              ('small', 'blue', 'cube', 'up'),
              ('big', 'red', 'ball', 'down')]
    for i, (size, color, shape, motion) in enumerate(combos):
        key = f'clip{i:03d}'
        _frames(root, key, n=12)
        (root / 'txt' / f'{key}.txt').write_text(
            f'A {size} {color} {shape} is moving {motion}.\n')
    return root


def test_iper_speed_modes(iper_tree, tok):
    random.seed(0)
    ds = IPERDataset(str(iper_tree), slow=True, text_len=24, image_size=24,
                     truncate_captions=True, tokenizer=tok, frame_num=4,
                     frame_step=2, cache=str(iper_tree / 'c.pkl'))
    descs = {ds[0]['description'].split()[-2] for _ in range(30)}
    assert descs <= {'slow', 'normal', 'fast'}
    assert len(descs) >= 2
    assert ds[0]['target'].shape == (4, 24, 24, 3)

    # deterministic slow_mode pins the speed
    ds_det = IPERDataset(str(iper_tree), slow=True, slow_mode='fast',
                         text_len=24, image_size=24, truncate_captions=True,
                         tokenizer=tok, frame_num=4, frame_step=2,
                         deterministic=True, cache=str(iper_tree / 'c.pkl'))
    assert ds_det[0]['description'].endswith('fast speed.')


def test_iper_drop_sentence(iper_tree, tok):
    random.seed(1)
    ds = IPERDataset(str(iper_tree), text_len=24, image_size=24,
                     truncate_captions=True, tokenizer=tok, frame_num=4,
                     frame_step=2, drop_sentence=True,
                     cache=str(iper_tree / 'c.pkl'))
    d = ds[0]['description']
    assert 'is performing' in d and d.endswith(',')


def test_shape_caption_parse():
    size, color, shape, motion = parse_shape_caption(
        'A small red cube is moving left.')
    assert (size, color, shape, motion) == ('small', 'red', 'cube', 'left.')


@pytest.mark.parametrize('mode,n_vis', [
    ('object', 1), ('object+same_background', 2),
    ('color+shape+background+rand', 3),
])
def test_shape_attr_modes(shape_tree, tok, mode, n_vis):
    random.seed(2)
    ds = ShapeAttrDataset(str(shape_tree), attr_mode=mode, text_len=40,
                          image_size=24, truncate_captions=True,
                          tokenizer=tok, frame_num=4, frame_step=2,
                          cache=str(shape_tree / 'c.pkl'))
    s = ds[0]
    assert s['visual'].shape == (n_vis, 24, 24, 3)
    assert 'moving' in s['description']


def test_shape_attr_negatives(shape_tree, tok):
    random.seed(3)
    ds = ShapeAttrDataset(str(shape_tree),
                          attr_mode='color+shape+background+rand',
                          return_neg=True, text_len=40, image_size=24,
                          truncate_captions=True, tokenizer=tok,
                          frame_num=4, frame_step=2,
                          cache=str(shape_tree / 'c.pkl'))
    s = ds[0]
    assert 'visual_neg' in s and s['visual_neg'].shape == (3, 24, 24, 3)
    assert 'text_neg' in s


def test_prep_tools(tmp_path):
    lines = ['vid001,Male,Wavy Hair,Young',
             'vid002,Eyeglasses,Smiling']
    make_text(lines, str(tmp_path / 'txt'), n=3)
    make_label(lines, str(tmp_path / 'label'))
    caps = (tmp_path / 'txt' / 'vid001.txt').read_text().splitlines()
    assert len(caps) == 3 and all(c for c in caps)
    label = (tmp_path / 'label' / 'vid001.txt').read_text().split(',')
    assert len(label) == 40 and label[20] == '1'  # Male
    label2 = (tmp_path / 'label' / 'vid002.txt').read_text().split(',')
    assert label2[15] == '1' and label2[31] == '1'  # Eyeglasses, Smiling
