"""Data pipeline: synthetic dataset trees driving the datasets + loader."""

import os
import random
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from mmvid_tpu.data import (
    DataLoader,
    TextVideoDataset,
    VoxDataset,
    infinite_batches,
)
from mmvid_tpu.data import pcfg
from mmvid_tpu.tokenizer import SimpleTokenizer


@pytest.fixture(scope='module')
def tok():
    return SimpleTokenizer()


def _write_frame(path, color):
    arr = np.full((40, 64, 3), color, np.uint8)
    arr += np.random.RandomState(0).randint(0, 30, arr.shape, dtype=np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture(scope='module')
def vox_tree(tmp_path_factory):
    """Tiny Multimodal-VoxCeleb-style tree: 3 identities x 12 frames."""
    root = tmp_path_factory.mktemp('data') / 'mmvox'
    keys = [f'id{i:05d}#clip{i}#000' for i in range(3)]
    for i, key in enumerate(keys):
        for sub in ('video', 'mask'):
            d = root / sub / key
            d.mkdir(parents=True)
            for j in range(12):
                _write_frame(d / f'{j:04d}.png', 40 * i + 5 * j)
        d = root / 'draw' / 'style1' / key
        d.mkdir(parents=True)
        for j in range(3):
            _write_frame(d / f'{j:04d}.png', 200 - 40 * i)
        (root / 'txt').mkdir(exist_ok=True)
        (root / 'txt' / f'{key}.txt').write_text(
            f'He has wavy hair. He is young. He is person {i}.\n'
            f'A man with wavy hair number {i}.\n')
        (root / 'label').mkdir(exist_ok=True)
        label = ['0'] * 40
        label[20] = '1'
        label[39 - i] = '1'
        (root / 'label' / f'{key}.txt').write_text(','.join(label))
    return root


@pytest.fixture(scope='module')
def imagestack_tree(tmp_path_factory):
    """Clips stored as one horizontally tiled PNG each (loader.py:60-72)."""
    root = tmp_path_factory.mktemp('data') / 'stack'
    (root / 'video').mkdir(parents=True)
    (root / 'txt').mkdir()
    for i in range(3):
        frames = [np.full((32, 32, 3), 30 * i + 10 * j, np.uint8)
                  for j in range(6)]
        strip = np.concatenate(frames, axis=1)  # [32, 6*32, 3]
        Image.fromarray(strip).save(root / 'video' / f'clip{i}.png')
        (root / 'txt' / f'clip{i}.txt').write_text(
            f'A tiled clip number {i}.\n')
    return root


def test_imagestack_dataset(imagestack_tree, tok):
    """TextImageStackDataset splits the strip into frames and returns the
    first frame as the visual control (reference loader.py:852-1110,
    return_vc=True semantics)."""
    from mmvid_tpu.data import TextImageStackDataset
    ds = TextImageStackDataset(str(imagestack_tree), text_len=20,
                               image_size=16, tokenizer=tok,
                               frame_num=4, frame_step=1,
                               deterministic=True)
    assert len(ds) == 3
    item = ds[1]
    assert item['target'].shape == (4, 16, 16, 3)
    assert item['visual'].shape == (1, 16, 16, 3)
    # deterministic start=0: visual IS the first target frame
    np.testing.assert_allclose(item['visual'][0], item['target'][0])
    # frames come from the tiled strip in order: brightness increases
    means = item['target'].mean(axis=(1, 2, 3))
    assert np.all(np.diff(means) > 0)
    assert item['text'].shape == (20,)


def test_imagestack_text_routing(imagestack_tree, tok):
    """`--dataset imagestack_text` routes through factories.get_dataset
    (reference utils/utils_train.py:64-80)."""
    from mmvid_tpu import factories
    from mmvid_tpu.config import process_args
    args = process_args(train=True, argv=[
        '--dataset', 'imagestack_text',
        '--image_text_folder', str(imagestack_tree),
        '--image_size', '16', '--text_seq_len', '20',
        '--frame_num', '4', '--frame_step', '1', '--deterministic'])
    ds = factories.get_dataset(args, tok)
    from mmvid_tpu.data import TextImageStackDataset
    assert isinstance(ds, TextImageStackDataset)
    assert ds[0]['target'].shape == (4, 16, 16, 3)


def test_imagestack_cache_reference_contract(imagestack_tree, tok,
                                             tmp_path):
    """The key-scan cache pickle carries the reference loader's full
    contract — root/keys/texts/videos/lengths (loader.py:916-920,953-960)
    — so a cache written here loads in the reference and vice versa."""
    import pickle
    from mmvid_tpu.data import TextImageStackDataset
    cache = tmp_path / 'scan.pkl'
    ds = TextImageStackDataset(str(imagestack_tree), text_len=20,
                               image_size=16, tokenizer=tok,
                               frame_num=4, frame_step=1,
                               deterministic=True, cache=str(cache))
    with open(cache, 'rb') as f:
        data = pickle.load(f)
    assert set(data) == {'root', 'keys', 'texts', 'videos', 'lengths'}
    # the fixture strips are 6 frames of 32px tiled horizontally
    assert all(data['lengths'][k] == 6 for k in data['keys'])
    ds2 = TextImageStackDataset(str(imagestack_tree), text_len=20,
                                image_size=16, tokenizer=tok,
                                frame_num=4, frame_step=1,
                                deterministic=True, cache=str(cache))
    assert ds2.keys == ds.keys and ds2.lengths == ds.lengths
    np.testing.assert_allclose(ds2[0]['target'], ds[0]['target'])


def test_text_video_dataset(vox_tree, tok):
    ds = TextVideoDataset(str(vox_tree), text_len=20, image_size=32,
                          truncate_captions=True, tokenizer=tok,
                          frame_num=4, frame_step=2,
                          cache=str(vox_tree / 'c1.pkl'))
    assert len(ds) == 3
    s = ds[0]
    assert s['target'].shape == (4, 32, 32, 3)
    assert s['visual'].shape == (1, 32, 32, 3)
    assert s['text'].shape == (20,)
    assert 0.0 <= s['target'].min() and s['target'].max() <= 1.0

    # deterministic mode picks the first caption + first frames
    ds_det = TextVideoDataset(str(vox_tree), text_len=20, image_size=32,
                              truncate_captions=True, tokenizer=tok,
                              frame_num=4, frame_step=2, deterministic=True,
                              cache=str(vox_tree / 'c1.pkl'))
    a = ds_det[1]
    b = ds_det[1]
    np.testing.assert_array_equal(a['target'], b['target'])
    assert a['description'].startswith('He has wavy hair. He is young.')


def test_text_video_negatives(vox_tree, tok):
    ds = TextVideoDataset(str(vox_tree), text_len=20, image_size=32,
                          truncate_captions=True, tokenizer=tok,
                          frame_num=4, frame_step=2, return_neg=True,
                          cache=str(vox_tree / 'c1.pkl'))
    s = ds[0]
    assert 'text_neg' in s and s['text_neg'].shape == (20,)


@pytest.mark.parametrize('mode,n_vis', [
    ('text', 1), ('mask+text', 1), ('draw+text', 1),
    ('image_same+mask', 2), ('image+draw', 2), ('draw+mask', 2),
    # image+video33 takes frames[:9:3] of the clip (2 of a 4-frame test
    # clip) plus one appearance image
    ('image+text_dropout', 1), ('image+video33', 3),
])
def test_vox_attr_modes(vox_tree, tok, mode, n_vis):
    ds = VoxDataset(str(vox_tree), attr_mode=mode, text_len=30,
                    image_size=32, truncate_captions=True, tokenizer=tok,
                    frame_num=4, frame_step=2,
                    cache=str(vox_tree / 'c1.pkl'))
    s = ds[0]
    assert s['visual'].shape == (n_vis, 32, 32, 3), mode
    assert s['target'].shape == (4, 32, 32, 3)
    if mode == 'image_same+mask':
        assert 'image one' in s['description']


def test_vox_label_negatives(vox_tree, tok):
    ds = VoxDataset(str(vox_tree), attr_mode='mask+text', text_len=30,
                    image_size=32, truncate_captions=True, tokenizer=tok,
                    frame_num=4, frame_step=2, return_neg=True,
                    cache=str(vox_tree / 'c1.pkl'))
    s = ds[1]
    assert 'text_neg' in s


def test_dataloader_sharding(vox_tree, tok):
    ds = TextVideoDataset(str(vox_tree), text_len=20, image_size=32,
                          truncate_captions=True, tokenizer=tok,
                          frame_num=4, frame_step=2,
                          cache=str(vox_tree / 'c1.pkl'))
    dl = DataLoader(ds, batch_size=2, num_workers=2, seed=0)
    batch = next(iter(dl))
    assert batch['target'].shape == (2, 4, 32, 32, 3)
    assert batch['text'].shape == (2, 20)

    # two hosts: EQUAL-length shards (wrap-around padded like torch
    # DistributedSampler — unequal shards would desync the SPMD loop),
    # together covering every sample
    dl0 = DataLoader(ds, batch_size=1, shuffle=False, process_index=0,
                     process_count=2)
    dl1 = DataLoader(ds, batch_size=1, shuffle=False, process_index=1,
                     process_count=2)
    i0, i1 = dl0._indices(), dl1._indices()
    assert len(i0) == len(i1)
    assert set(i0) | set(i1) == set(range(len(ds)))

    it = infinite_batches(DataLoader(ds, batch_size=2, num_workers=2))
    for _ in range(4):  # crosses an epoch boundary (3 samples, batch 2)
        b = next(it)
        assert b['target'].shape[0] == 2


def test_pcfg_generation():
    random.seed(0)
    np.random.seed(0)
    pred = np.zeros(40, bool)
    for a in ('Wavy_Hair', 'Young', 'Male', 'Eyeglasses', 'No_Beard'):
        pred[pcfg.ATTR.index(a)] = True
    sents = pcfg.generate(pred.copy(), n=3)
    assert len(sents) == 3
    joined = ' '.join(sents).lower()
    assert 'wavy hair' in joined
    for s in sents:
        assert s.endswith('.') and s[0].isupper()

    rand_sents = pcfg.generate_random_sentences(n_attr=8, n_sent=4)
    assert len(rand_sents) == 4 and all(s for s in rand_sents)


def test_vox_cat1_getitem(vox_tree, tok):
    """attr_mode='cat1' returns an attribute-prompt batch directly from
    __getitem__ (loader_ext.py:469-487)."""
    male = pcfg.ATTR.index('Male')
    ds = VoxDataset(str(vox_tree), attr_mode='cat1', cat1=[male, 39],
                    text_len=30, image_size=32, truncate_captions=True,
                    tokenizer=tok, frame_num=4, frame_step=2,
                    cache=str(vox_tree / 'c1.pkl'))
    s = ds[0]
    assert s['target'].shape == (2, 4, 32, 32, 3)
    assert s['text'].shape[0] == 2
    assert ds[1]['target'].shape == (2, 4, 32, 32, 3)


def test_vox_cat2_getitem(vox_tree, tok):
    """attr_mode='cat2': five fixed attribute prompts (gender/young/bald/
    eyeglasses/chubby), one clip each (loader_ext.py:488-543)."""
    ds = VoxDataset(str(vox_tree), attr_mode='cat2', text_len=30,
                    image_size=32, truncate_captions=True, tokenizer=tok,
                    frame_num=4, frame_step=2,
                    cache=str(vox_tree / 'c1.pkl'))
    s0, s1 = ds[0], ds[1]
    assert s0['target'].shape == (5, 4, 32, 32, 3)
    assert s0['text'].shape[0] == 5
    # gender phrasing alternates with ind parity ('A boy.' vs 'A guy.';
    # every fixture identity is Male via label col 20)
    assert not np.array_equal(s0['text'][0], s1['text'][0])
    # the four fixed prompts are parity-independent
    for row in range(1, 5):
        assert np.array_equal(s0['text'][row], s1['text'][row])
