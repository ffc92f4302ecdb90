"""Checkpoint format round-trips: flax -> torch state_dict -> flax, and a
written dalle.pt loading back through the reference-format reader."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.bert import BertConfig, BertCore
from mmvid_tpu.models.clip import ClipStackConfig
from mmvid_tpu.models.vqgan import VQGanConfig, VQModel
from mmvid_tpu.utils.torch_compat import (
    bert_params_to_torch,
    convert_bert,
    convert_vqgan,
    load_dalle_checkpoint,
    save_dalle_checkpoint,
    vqgan_params_to_torch,
)

CFG = BertConfig(dim=64, num_text_tokens=100, text_seq_len=8,
                 num_visuals=1, num_targets=2, num_image_tokens=1024,
                 image_fmap_size=8, image_size=32,
                 clip=ClipStackConfig(width=64, layers=2, heads=2))


def _tree_equal(a, b, path=''):
    assert set(a.keys()) == set(b.keys()), (
        f'{path}: {set(a) ^ set(b)}')
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f'{path}/{k}')
        else:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       err_msg=f'{path}/{k}')


def test_bert_params_roundtrip():
    core = BertCore(CFG)
    params = core.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 8), jnp.int32),
                       jnp.zeros((1, CFG.visual_seq_len), jnp.int32),
                       jnp.zeros((1, CFG.target_seq_len), jnp.int32)
                       )['params']
    sd = bert_params_to_torch(params)
    back = convert_bert(sd)['params']
    _tree_equal(params, back)


def test_vqgan_params_roundtrip():
    cfg = VQGanConfig(resolution=32, ch=32, ch_mult=(1, 2),
                      num_res_blocks=1, z_channels=64, embed_dim=64,
                      n_embed=128)
    model = VQModel(cfg)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 32, 32, 3)))['params']
    sd = vqgan_params_to_torch(params)
    back = convert_vqgan(sd)
    _tree_equal(params, back)


def test_dalle_pt_file_roundtrip_stacked_blocks(tmp_path):
    """A pp-trained param tree (stacked 'blocks' layout) must export to the
    reference's per-block dalle.pt format and load back equal to its
    per-block form (regression: the `iter` kwarg used to shadow the builtin
    on exactly this branch)."""
    from mmvid_tpu.parallel.pipeline import stack_block_params

    core = BertCore(CFG)
    params = core.init(jax.random.PRNGKey(3),
                       jnp.zeros((1, 8), jnp.int32),
                       jnp.zeros((1, CFG.visual_seq_len), jnp.int32),
                       jnp.zeros((1, CFG.target_seq_len), jnp.int32)
                       )['params']
    stacked = {**params, 'transformer': stack_block_params(
        params['transformer'], CFG.clip.layers)}
    path = str(tmp_path / 'dalle_pp.pt')
    save_dalle_checkpoint(path, params=stacked, iter=7)
    ckpt = load_dalle_checkpoint(path)
    assert ckpt['iter'] == 7
    _tree_equal(params, ckpt['params'])


def test_dalle_pt_file_roundtrip(tmp_path):
    core = BertCore(CFG)
    params = core.init(jax.random.PRNGKey(2),
                       jnp.zeros((1, 8), jnp.int32),
                       jnp.zeros((1, CFG.visual_seq_len), jnp.int32),
                       jnp.zeros((1, CFG.target_seq_len), jnp.int32)
                       )['params']
    path = str(tmp_path / 'dalle.pt')
    save_dalle_checkpoint(path, params=params, iter=123,
                          hparams={'dim': 64, 'text_seq_len': 8})
    ckpt = load_dalle_checkpoint(path)
    assert ckpt['iter'] == 123
    assert ckpt['hparams']['dim'] == 64
    _tree_equal(params, ckpt['params'])
