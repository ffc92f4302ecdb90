"""ART-V autoregressive model: oracle loss parity + KV-cache consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.artv import (
    ArtvConfig,
    ArtvCore,
    ar_sample,
    artv_loss,
    logits_block_mask,
)
from mmvid_tpu.models.clip import ClipStackConfig
from mmvid_tpu.utils.torch_compat import convert_bert

from oracles import load_reference_artv

CFG = ArtvConfig(dim=64, num_text_tokens=50, text_seq_len=6, num_visuals=1,
                 num_targets=2, num_image_tokens=1024, image_fmap_size=8,
                 image_size=32,
                 clip=ClipStackConfig(width=64, layers=2, heads=2))


@pytest.fixture(scope='module')
def artv_pair():
    ref = load_reference_artv(dim=64, heads=2, layers=2, text_seq_len=6,
                              num_text_tokens=50, num_visuals=1,
                              num_targets=2, image_size=32, vae_layers=2,
                              seed=21)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_bert(sd)['params']
    return ref, params


def test_artv_loss_parity(artv_pair):
    import torch
    ref, params = artv_pair
    core = ArtvCore(CFG)

    rng = np.random.RandomState(31)
    text = rng.randint(1, 50, size=(2, 6))
    text[:, 4:] = 0
    visual = rng.randint(0, 1024, size=(2, CFG.visual_seq_len))
    image = rng.randint(0, 1024, size=(2, CFG.target_seq_len))

    with torch.no_grad():
        loss_ref, z1, z2 = ref(torch.from_numpy(text).long(),
                               visual=torch.from_numpy(visual).long(),
                               target=torch.from_numpy(image).long(),
                               return_loss=True)
    loss, zr, zv = artv_loss(core, params, jnp.asarray(text),
                             jnp.asarray(visual), jnp.asarray(image))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-4)
    assert float(zr) == 0.0 and float(zv) == 0.0


def test_artv_logits_parity(artv_pair):
    import torch
    ref, params = artv_pair
    core = ArtvCore(CFG)

    rng = np.random.RandomState(33)
    text = rng.randint(1, 50, size=(2, 6))
    visual = rng.randint(0, 1024, size=(2, CFG.visual_seq_len))
    image = rng.randint(0, 1024, size=(2, CFG.target_seq_len))

    with torch.no_grad():
        logits_ref = ref(torch.from_numpy(text).long(),
                         visual=torch.from_numpy(visual).long(),
                         target=torch.from_numpy(image).long(),
                         return_loss=False).numpy()
    logits = np.asarray(core.apply({'params': params}, jnp.asarray(text),
                                   jnp.asarray(visual), jnp.asarray(image)))
    mask = logits_block_mask(CFG)
    # compare only allowed entries (reference fills the rest with -maxfloat)
    allowed = ~mask
    np.testing.assert_allclose(
        logits[:, allowed], logits_ref[:, allowed], rtol=3e-4, atol=3e-4)


def test_ar_sample_kv_cache_matches_full_forward():
    """Greedy KV-cached decode must equal greedy full-forward decode."""
    core = ArtvCore(CFG)
    rng = np.random.RandomState(41)
    text = jnp.asarray(rng.randint(1, 50, (1, 6)), jnp.int32)
    visual = jnp.asarray(rng.randint(0, 1024, (1, CFG.visual_seq_len)),
                         jnp.int32)
    params = core.init(jax.random.PRNGKey(0), text, visual,
                       jnp.zeros((1, CFG.target_seq_len), jnp.int32)
                       )['params']

    # near-greedy: temperature ~ 0 makes categorical = argmax
    toks_cached = np.asarray(ar_sample(core, params, text, visual,
                                       jax.random.PRNGKey(1),
                                       filter_thres=0.5,
                                       temperature=1e-6))

    # full-forward greedy reference (teacher-forcing loop on ArtvCore)
    out = []
    img_so_far = jnp.zeros((1, 0), jnp.int32)
    for i in range(CFG.target_seq_len):
        # run the training forward on a padded target, read position
        # ctrl_len + i - 1 of the truncated sequence
        padded = jnp.concatenate(
            [img_so_far,
             jnp.zeros((1, CFG.target_seq_len - img_so_far.shape[1]),
                       jnp.int32)], axis=1)
        logits = core.apply({'params': params}, text, visual, padded)
        pos = CFG.control_seq_len + i  # bos shifts target positions by +1,
        # truncation drops the last, so target token i is predicted at this
        # row of the [total_seq_len, V] output
        row = logits[0, pos]
        nxt = int(jnp.argmax(row[CFG.num_control_tokens:]))
        out.append(nxt)
        img_so_far = jnp.concatenate(
            [img_so_far, jnp.full((1, 1), nxt, jnp.int32)], axis=1)

    np.testing.assert_array_equal(toks_cached[0], np.asarray(out))


def test_ar_sample_fused_decode_matches(monkeypatch):
    """MMVID_ARTV_FUSED=1 (ops/artv_decode.py, one Pallas program per
    block per token) must reproduce the unfused greedy rollout.  On the
    fp32 tiny model the online-softmax accumulation is numerically tight
    enough for exact token equality; bf16-model near-ties are covered by
    the HW A/B in ROADMAP.md."""
    core = ArtvCore(CFG)
    rng = np.random.RandomState(43)
    text = jnp.asarray(rng.randint(1, 50, (2, 6)), jnp.int32)
    visual = jnp.asarray(rng.randint(0, 1024, (2, CFG.visual_seq_len)),
                         jnp.int32)
    params = core.init(jax.random.PRNGKey(0), text, visual,
                       jnp.zeros((2, CFG.target_seq_len), jnp.int32)
                       )['params']
    t_ref = np.asarray(ar_sample(core, params, text, visual,
                                 jax.random.PRNGKey(1), temperature=1e-6))
    monkeypatch.setenv('MMVID_ARTV_FUSED', '1')
    t_fused = np.asarray(ar_sample(core, params, text, visual,
                                   jax.random.PRNGKey(1),
                                   temperature=1e-6))
    np.testing.assert_array_equal(t_fused, t_ref)

    # windowing off (single full-width segment) must also agree — the
    # fused kernel's chunk masking is what makes the pad inert
    monkeypatch.setenv('MMVID_ARTV_WINDOW', '0')
    t_nw = np.asarray(ar_sample(core, params, text, visual,
                                jax.random.PRNGKey(1), temperature=1e-6))
    np.testing.assert_array_equal(t_nw, t_ref)
    monkeypatch.delenv('MMVID_ARTV_WINDOW')
    monkeypatch.delenv('MMVID_ARTV_FUSED')

    # flat lane-dense cache layout (MMVID_ARTV_FLAT=1, XLA path): same
    # greedy rollout (fp32 tiny model -> exact)
    monkeypatch.setenv('MMVID_ARTV_FLAT', '1')
    t_flat = np.asarray(ar_sample(core, params, text, visual,
                                  jax.random.PRNGKey(1),
                                  temperature=1e-6))
    np.testing.assert_array_equal(t_flat, t_ref)


def test_ar_sample_int8_decode_proxy():
    """int8=True decode (int8 weights + int8 KV caches, beyond-parity
    serving path): greedy trajectories must stay close to the bf16 path on
    a shared tiny model.  Sequential sampling compounds any argmax flip, so
    the proxy is token agreement on the full greedy rollout plus exactness
    of shapes/ranges — the real-HW throughput claim lives in ROADMAP.md."""
    core = ArtvCore(CFG)
    rng = np.random.RandomState(7)
    text = jnp.asarray(rng.randint(1, 50, (2, 6)), jnp.int32)
    visual = jnp.asarray(rng.randint(0, 1024, (2, CFG.visual_seq_len)),
                         jnp.int32)
    params = core.init(jax.random.PRNGKey(0), text, visual,
                       jnp.zeros((2, CFG.target_seq_len), jnp.int32)
                       )['params']
    t_bf = np.asarray(ar_sample(core, params, text, visual,
                                jax.random.PRNGKey(1), temperature=1e-6))
    t_i8 = np.asarray(ar_sample(core, params, text, visual,
                                jax.random.PRNGKey(1), temperature=1e-6,
                                int8=True))
    assert t_i8.shape == t_bf.shape == (2, CFG.target_seq_len)
    assert 0 <= t_i8.min() and t_i8.max() < CFG.num_image_tokens
    # measured 0.855 on this seed/model; random-weight logits are
    # near-uniform so flips at ties are expected — real-weight margins
    # are sharper
    agree = (t_bf == t_i8).mean()
    assert agree > 0.6, f'int8 greedy agreement collapsed: {agree}'
    # int8 must be deterministic given the key
    t_i8b = np.asarray(ar_sample(core, params, text, visual,
                                 jax.random.PRNGKey(1), temperature=1e-6,
                                 int8=True))
    np.testing.assert_array_equal(t_i8, t_i8b)


def test_artv_generate_token_range():
    core = ArtvCore(CFG)
    text = jnp.ones((2, 6), jnp.int32)
    visual = jnp.zeros((2, CFG.visual_seq_len), jnp.int32)
    params = core.init(jax.random.PRNGKey(0), text, visual,
                       jnp.zeros((2, CFG.target_seq_len), jnp.int32)
                       )['params']
    toks = np.asarray(ar_sample(core, params, text, visual,
                                jax.random.PRNGKey(2)))
    assert toks.shape == (2, CFG.target_seq_len)
    assert toks.min() >= 0 and toks.max() < 1024
