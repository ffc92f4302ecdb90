"""CLIP backbone + BERT model parity vs the reference (oracle) implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.axial import AxialPositionalEmbedding
from mmvid_tpu.models.bert import BertConfig, BertCore, bert_losses
from mmvid_tpu.models.clip import (
    ClipStackConfig,
    TransformerStack,
    build_attention_mask,
)
from mmvid_tpu.utils.torch_compat import convert_bert, convert_clip_resblocks

from oracles import install_reference, load_reference_bert


def test_clip_stack_parity_causal():
    install_reference()
    import torch
    torch.manual_seed(0)
    from mmvid_pytorch.transformers.clip_model import (
        OpenAICLIPTransformer,
        Transformer,
    )

    width, layers, heads, L = 64, 2, 2, 10
    ref = Transformer(width=width, layers=layers, heads=heads)
    mask = OpenAICLIPTransformer.build_attention_mask(
        None, L, mask_type='causal')
    for blk in ref.resblocks:
        blk.attn_mask = mask
    ref.eval()

    x = np.random.RandomState(0).randn(3, L, width).astype(np.float32)
    with torch.no_grad():
        # reference runs LND (clip_model.py:580-584)
        out_ref = ref(torch.from_numpy(x).permute(1, 0, 2)).permute(1, 0, 2)
    out_ref = out_ref.numpy()

    params = convert_clip_resblocks(
        {k: v.numpy() for k, v in ref.state_dict().items()}, prefix='')
    stack = TransformerStack(ClipStackConfig(width=width, layers=layers,
                                             heads=heads))
    out = stack.apply({'params': params}, jnp.asarray(x),
                      build_attention_mask(L, 'causal'))
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=2e-4, atol=2e-4)


def test_mask_prev_matches_reference():
    install_reference()
    import torch
    from mmvid_pytorch.transformers.clip_model import OpenAICLIPTransformer

    L, idx = 12, [5, 6]
    ref = OpenAICLIPTransformer.build_attention_mask(
        None, L, mask_type='mask_prev', index=idx).numpy()
    mine = np.asarray(build_attention_mask(L, 'mask_prev', index=idx))
    # same -inf pattern (we use a large finite negative)
    np.testing.assert_array_equal(np.isneginf(ref), mine < -1e8)
    assert (mine[~(mine < -1e8)] == 0).all()


def test_axial_positional_embedding_parity():
    install_reference(need_bert_deps=True)
    import torch
    from axial_positional_embedding import (
        AxialPositionalEmbedding as RefAxial,
    )

    dim, shape = 16, (2, 3, 3)
    torch.manual_seed(1)
    ref = RefAxial(dim, shape)
    x = torch.zeros(2, 18, dim)
    with torch.no_grad():
        out_ref = ref(x).numpy()

    params = {f'weights_{i}': getattr(ref, f'weights_{i}').detach().numpy()
              for i in range(3)}
    mod = AxialPositionalEmbedding(dim, shape)
    out = mod.apply({'params': params}, jnp.zeros((2, 18, dim)))
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-5, atol=1e-6)


@pytest.fixture(scope='module')
def bert_pair():
    """Reference BERT (no visuals) + converted params + matching config."""
    ref = load_reference_bert(dim=64, heads=2, layers=2, text_seq_len=8,
                              num_text_tokens=100, num_visuals=0,
                              num_targets=2, image_size=32, vae_layers=2,
                              num_tokens=1024, seed=3)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    trees = convert_bert(sd)
    cfg = BertConfig(dim=64, num_text_tokens=100, text_seq_len=8,
                     num_visuals=0, num_targets=2, num_image_tokens=1024,
                     image_fmap_size=8, image_size=32,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    return ref, trees['params'], cfg


def test_bert_control_embedding_parity(bert_pair):
    import torch
    ref, params, cfg = bert_pair
    core = BertCore(cfg)

    rng = np.random.RandomState(5)
    text = rng.randint(1, 100, size=(2, 8))
    text[:, 6:] = 0  # padding -> unique per-position ids

    with torch.no_grad():
        ctrl_ref = ref(torch.from_numpy(text).long(), return_loss=False)
    ctrl_ref = ctrl_ref.numpy()

    ctrl = core.apply({'params': params}, jnp.asarray(text), None,
                      method=BertCore.control_embedding)
    assert ctrl.shape == ctrl_ref.shape == (2, cfg.control_seq_len, 64)
    np.testing.assert_allclose(np.asarray(ctrl), ctrl_ref,
                               rtol=1e-5, atol=1e-5)


def test_bert_losses_parity_fully_masked(bert_pair):
    """Strategy 2 (mask-everything) makes the reference forward deterministic:
    compare MSM + REL losses end-to-end through the transformer."""
    import torch
    ref, params, cfg = bert_pair
    core = BertCore(cfg)

    rng = np.random.RandomState(7)
    text = rng.randint(1, 100, size=(2, 8))
    target_tokens = rng.randint(0, 1024, size=(2, cfg.target_seq_len))

    with torch.no_grad():
        loss_msm_ref, loss_rel_ref, loss_vid_ref = ref(
            torch.from_numpy(text).long(),
            target=torch.from_numpy(target_tokens).long(),
            return_loss=True, rel=True, vid=False,
            msm_strategy_prob=[0.0, 1.0, 0.0, 0.0])

    keep = jnp.zeros((2, cfg.target_seq_len), bool)   # mask everything
    nfm = jnp.zeros((2,), jnp.float32)
    loss_msm, loss_rel, loss_vid = bert_losses(
        core, params, text=jnp.asarray(text), visual_tokens=None,
        target_tokens=jnp.asarray(target_tokens), keep_gt_mask=keep,
        not_fully_masked=nfm, rel=True, vid=False)

    np.testing.assert_allclose(float(loss_msm), float(loss_msm_ref),
                               rtol=2e-4)
    np.testing.assert_allclose(float(loss_rel), float(loss_rel_ref),
                               rtol=2e-4)
    assert float(loss_vid) == 0.0 and float(loss_vid_ref) == 0.0


def test_bert_losses_parity_with_visuals():
    """Visual-control branch parity: tokens fed pre-tokenized, fully-masked
    MSM strategy, REL via deterministic half-swap."""
    import torch
    ref = load_reference_bert(dim=64, heads=2, layers=2, text_seq_len=6,
                              num_text_tokens=50, num_visuals=2,
                              num_targets=2, image_size=32, vae_layers=2,
                              num_tokens=1024, seed=11)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_bert(sd)['params']
    cfg = BertConfig(dim=64, num_text_tokens=50, text_seq_len=6,
                     num_visuals=2, num_targets=2, num_image_tokens=1024,
                     image_fmap_size=8, image_size=32,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    core = BertCore(cfg)

    rng = np.random.RandomState(13)
    text = rng.randint(1, 50, size=(2, 6))
    visual_tokens = rng.randint(0, 1024, size=(2, cfg.visual_seq_len))
    target_tokens = rng.randint(0, 1024, size=(2, cfg.target_seq_len))

    with torch.no_grad():
        ctrl_ref = ref(torch.from_numpy(text).long(),
                       visual=torch.from_numpy(visual_tokens).long(),
                       return_loss=False).numpy()
        loss_msm_ref, loss_rel_ref, _ = ref(
            torch.from_numpy(text).long(),
            visual=torch.from_numpy(visual_tokens).long(),
            target=torch.from_numpy(target_tokens).long(),
            return_loss=True, rel=True, vid=False,
            msm_strategy_prob=[0.0, 1.0, 0.0, 0.0])

    ctrl = core.apply({'params': params}, jnp.asarray(text),
                      jnp.asarray(visual_tokens),
                      method=BertCore.control_embedding)
    np.testing.assert_allclose(np.asarray(ctrl), ctrl_ref,
                               rtol=1e-5, atol=1e-5)

    keep = jnp.zeros((2, cfg.target_seq_len), bool)
    loss_msm, loss_rel, _ = bert_losses(
        core, params, text=jnp.asarray(text),
        visual_tokens=jnp.asarray(visual_tokens),
        target_tokens=jnp.asarray(target_tokens), keep_gt_mask=keep,
        not_fully_masked=jnp.zeros((2,)), rel=True, vid=False)
    np.testing.assert_allclose(float(loss_msm), float(loss_msm_ref),
                               rtol=2e-4)
    np.testing.assert_allclose(float(loss_rel), float(loss_rel_ref),
                               rtol=2e-4)


def test_bert_losses_parity_negvc():
    """negvc REL parity: the negative control is [REL]+text_neg+[ST1][VID]
    with the visual segment dropped (shorter sequence, mask sliced [:L,:L];
    reference dalle_bert.py:909-975, 1048-1055).  visual_neg must be dead
    (reference dalle_bert.py:885)."""
    import torch
    ref = load_reference_bert(dim=64, heads=2, layers=2, text_seq_len=6,
                              num_text_tokens=50, num_visuals=2,
                              num_targets=2, image_size=32, vae_layers=2,
                              num_tokens=1024, seed=17)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_bert(sd)['params']
    cfg = BertConfig(dim=64, num_text_tokens=50, text_seq_len=6,
                     num_visuals=2, num_targets=2, num_image_tokens=1024,
                     image_fmap_size=8, image_size=32,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    core = BertCore(cfg)

    rng = np.random.RandomState(19)
    text = rng.randint(1, 50, size=(2, 6))
    text_neg = rng.randint(1, 50, size=(2, 6))
    visual_tokens = rng.randint(0, 1024, size=(2, cfg.visual_seq_len))
    target_tokens = rng.randint(0, 1024, size=(2, cfg.target_seq_len))

    with torch.no_grad():
        loss_msm_ref, loss_rel_ref, _ = ref(
            torch.from_numpy(text).long(),
            visual=torch.from_numpy(visual_tokens).long(),
            target=torch.from_numpy(target_tokens).long(),
            return_loss=True, rel=True, vid=False, negvc=True,
            text_neg=torch.from_numpy(text_neg).long(),
            visual_neg=torch.zeros(1),
            msm_strategy_prob=[0.0, 1.0, 0.0, 0.0])

    keep = jnp.zeros((2, cfg.target_seq_len), bool)
    loss_msm, loss_rel, _ = bert_losses(
        core, params, text=jnp.asarray(text),
        visual_tokens=jnp.asarray(visual_tokens),
        target_tokens=jnp.asarray(target_tokens), keep_gt_mask=keep,
        not_fully_masked=jnp.zeros((2,)), rel=True, vid=False,
        control_neg=jnp.asarray(text_neg))
    np.testing.assert_allclose(float(loss_msm), float(loss_msm_ref),
                               rtol=2e-4)
    np.testing.assert_allclose(float(loss_rel), float(loss_rel_ref),
                               rtol=2e-4)

    # a different text_neg must change loss_rel
    other = bert_losses(
        core, params, text=jnp.asarray(text),
        visual_tokens=jnp.asarray(visual_tokens),
        target_tokens=jnp.asarray(target_tokens), keep_gt_mask=keep,
        not_fully_masked=jnp.zeros((2,)), rel=True, vid=False,
        control_neg=jnp.asarray(text))[1]
    assert abs(float(other) - float(loss_rel)) > 1e-6
