"""Fixed-language-model text path: feature-mapping bottleneck parity.

When --fixed_language_model is set the text input is a single pooled
feature vector mapped through LN/Linear/LN/Linear/LN (dalle_bert.py:307-322)
and text_seq_len collapses to 1 (dalle_bert.py:309)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.bert import BertConfig, BertCore, bert_losses
from mmvid_tpu.models.clip import ClipStackConfig
from mmvid_tpu.utils.torch_compat import convert_bert

from oracles import load_reference_bert


@pytest.fixture(scope='module')
def lm_pair():
    ref = load_reference_bert(
        dim=64, heads=2, layers=2, text_seq_len=8, num_text_tokens=100,
        num_visuals=0, num_targets=2, image_size=32, vae_layers=2,
        seed=31, fixed_language_model='roberta-large',
        text_feature_dim=24, text_emb_bottleneck='8')
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_bert(sd)['params']
    cfg = BertConfig(dim=64, num_text_tokens=100, text_seq_len=8,
                     num_visuals=0, num_targets=2, num_image_tokens=1024,
                     image_fmap_size=8, image_size=32,
                     fixed_language_model='roberta-large',
                     text_feature_dim=24, text_emb_bottleneck='8',
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    return ref, params, cfg


def test_layout_collapses_text(lm_pair):
    _, _, cfg = lm_pair
    assert cfg.effective_text_seq_len == 1
    # [REL] + 1 text + [ST1][VID] = 4 control tokens
    assert cfg.control_seq_len == 4
    assert cfg.st1_tok_index == 2 and cfg.vid_tok_index == 3


def test_feature_control_embedding_parity(lm_pair):
    import torch
    ref, params, cfg = lm_pair
    core = BertCore(cfg)

    rng = np.random.RandomState(3)
    feats = rng.randn(2, 24).astype(np.float32)
    with torch.no_grad():
        ctrl_ref = ref(torch.from_numpy(feats), return_loss=False).numpy()
    ctrl = core.apply({'params': params}, jnp.asarray(feats), None,
                      method=BertCore.control_embedding)
    np.testing.assert_allclose(np.asarray(ctrl), ctrl_ref, rtol=1e-4,
                               atol=1e-5)


def test_feature_loss_parity(lm_pair):
    import torch
    ref, params, cfg = lm_pair
    core = BertCore(cfg)

    rng = np.random.RandomState(5)
    feats = rng.randn(2, 24).astype(np.float32)
    target = rng.randint(0, 1024, size=(2, cfg.target_seq_len))
    with torch.no_grad():
        msm_ref, rel_ref, _ = ref(
            torch.from_numpy(feats),
            target=torch.from_numpy(target).long(), return_loss=True,
            rel=True, vid=False, msm_strategy_prob=[0.0, 1.0, 0.0, 0.0])
    keep = jnp.zeros((2, cfg.target_seq_len), bool)
    msm, rel, _ = bert_losses(
        core, params, text=jnp.asarray(feats), visual_tokens=None,
        target_tokens=jnp.asarray(target), keep_gt_mask=keep,
        not_fully_masked=jnp.zeros((2,)), rel=True, vid=False)
    np.testing.assert_allclose(float(msm), float(msm_ref), rtol=2e-4)
    np.testing.assert_allclose(float(rel), float(rel_ref), rtol=2e-4)


def test_get_fixed_language_model_matches_torch(tmp_path, monkeypatch):
    """factories.get_fixed_language_model's mean-pool feature extraction
    must match HF torch RoBERTa exactly (reference utils_train.py:194-222
    + utils/utils.py:53-59), validated on a synthetic tiny checkpoint
    (zero-egress: no roberta-large weights in this env)."""
    import json
    import types

    import torch
    from transformers import (
        RobertaConfig, RobertaModel, RobertaTokenizerFast)

    from mmvid_tpu import factories

    # tiny byte-level-BPE tokenizer files
    vocab = {t: i for i, t in enumerate(
        ['<s>', '<pad>', '</s>', '<unk>', '<mask>']
        + list('abcdefghij') + ['hello', 'world', 'Ġ'])}
    (tmp_path / 'vocab.json').write_text(json.dumps(vocab))
    (tmp_path / 'merges.txt').write_text('#version: 0.2\n')
    tok = RobertaTokenizerFast(vocab_file=str(tmp_path / 'vocab.json'),
                               merges_file=str(tmp_path / 'merges.txt'))
    tok.save_pretrained(str(tmp_path))

    cfg = RobertaConfig(vocab_size=len(vocab), hidden_size=16,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=32, max_position_embeddings=64,
                        pad_token_id=1, bos_token_id=0, eos_token_id=2)
    torch.manual_seed(0)
    tmodel = RobertaModel(cfg).eval()
    tmodel.save_pretrained(str(tmp_path))

    monkeypatch.setenv('ROBERTA_PATH', str(tmp_path))
    args = types.SimpleNamespace(fixed_language_model='roberta-large')
    encode, dim = factories.get_fixed_language_model(args)
    assert dim == 16

    texts = ['hello world', 'a b c d e f']
    feats = encode(texts)
    assert feats.shape == (2, 16)

    with torch.no_grad():
        enc = tok(texts, padding=True, truncation=True, max_length=128,
                  return_tensors='pt')
        out = tmodel(**enc).last_hidden_state
        mask = enc['attention_mask'][..., None].float()
        ref = ((out * mask).sum(1) / mask.sum(1)).numpy()
    np.testing.assert_allclose(feats, ref, rtol=1e-4, atol=1e-5)
