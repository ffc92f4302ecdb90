"""End-to-end ART-V sampling parity vs the torch oracle on SHARED weights.

Mirrors the BERT suite (test_sampler_parity.py) for the AR baseline: the
existing ART-V tests prove per-forward loss/logits parity and
KV-cache==full-forward consistency, but nothing ran the reference's
`DALLE.generate_images` AR loop (/root/reference/mmvid_pytorch/
dalle_artv.py:236-304) end-to-end against `ar_sample` before.  Two levels:

(a) Greedy trajectory: temperature -> 0 turns both samplers into
    argmax-chains over identical logits (logits parity is separately
    proven to ~1e-5), so the full 128-token rollouts must match token for
    token — covering prefill, per-step last-position logits, the
    control-token offset (`sample -= num_control_tokens`), and the
    image-range head slice.

(b) Marginal distribution: >=800 independent trajectories per side on a
    tiny 32-vocab shared-weights model, compared per position by a pooled
    two-sample chi^2 bound and by TV distance against the reference's own
    split-half sampling noise — at filter_thres=0.5 (where the reference's
    top_k over the FULL vocab keeps every finite image logit, i.e. the
    filter is a no-op: dalle_artv.py:61-67 with k > 32 finite entries)
    AND at filter_thres=0.95 (k=6 < 32: the top-k cutoff is live on both
    sides).

The torch side's tokens are captured by stubbing `vae.decode` on the
oracle's FakeVae (generate_images only returns decoded pixels).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.artv import ArtvConfig, ArtvCore, ar_sample
from mmvid_tpu.models.clip import ClipStackConfig
from mmvid_tpu.utils.torch_compat import convert_bert

from oracles import load_reference_artv
from test_sampler_parity import _chi2_stat, _marginals, _tv

pytestmark = pytest.mark.slow


def _capture_tokens(ref):
    """Stub vae.decode to capture the sampled img_seq (the oracle's
    FakeVae has no decode; generate_images returns pixels otherwise)."""
    import torch
    captured = {}

    def fake_decode(seq):
        captured['seq'] = seq.detach().clone()
        return torch.zeros(seq.shape[0], 3, ref.vae.image_size,
                           ref.vae.image_size)

    ref.vae.decode = fake_decode
    return captured


def _ref_sample(ref, text_np, visual_np, *, filter_thres, temperature,
                seed):
    """Reference AR rollout -> [B, target_seq_len] token ids."""
    import torch
    torch.manual_seed(seed)
    captured = _capture_tokens(ref)
    with torch.no_grad():
        ref.generate_images(torch.from_numpy(text_np).long(),
                            visual=torch.from_numpy(visual_np).long(),
                            filter_thres=filter_thres,
                            temperature=temperature)
    seq = captured['seq']
    b = text_np.shape[0]
    return seq.reshape(b, -1).numpy()


@pytest.fixture(scope='module')
def greedy_pair():
    """Flagship-shaped tiny model: 2 frames of 8x8 tokens, 1024 vocab."""
    ref = load_reference_artv(dim=64, heads=2, layers=2, text_seq_len=6,
                              num_text_tokens=50, num_visuals=1,
                              num_targets=2, image_size=32, vae_layers=2,
                              seed=21)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_bert(sd)['params']
    cfg = ArtvConfig(dim=64, num_text_tokens=50, text_seq_len=6,
                     num_visuals=1, num_targets=2, num_image_tokens=1024,
                     image_fmap_size=8, image_size=32,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    return ref, params, cfg


@pytest.fixture(scope='module')
def dist_pair():
    """Distribution-stats model: 1 frame of 4x4 tokens, 32-token vocab."""
    ref = load_reference_artv(dim=64, heads=2, layers=2, text_seq_len=6,
                              num_text_tokens=50, num_visuals=1,
                              num_targets=1, image_size=16, vae_layers=2,
                              num_tokens=32, seed=33)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_bert(sd)['params']
    cfg = ArtvConfig(dim=64, num_text_tokens=50, text_seq_len=6,
                     num_visuals=1, num_targets=1, num_image_tokens=32,
                     image_fmap_size=4, image_size=16,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    return ref, params, cfg


def test_greedy_trajectory_parity(greedy_pair):
    """temperature->0: the 128-token AR rollouts match token for token."""
    ref, params, cfg = greedy_pair
    core = ArtvCore(cfg)
    rng = np.random.RandomState(51)
    text = rng.randint(1, 50, size=(2, 6))
    visual = rng.randint(0, 1024, size=(2, cfg.visual_seq_len))

    toks_ref = _ref_sample(ref, text, visual, filter_thres=0.5,
                           temperature=1e-8, seed=71)
    toks = np.asarray(ar_sample(core, params, jnp.asarray(text),
                                jnp.asarray(visual),
                                jax.random.PRNGKey(72),
                                filter_thres=0.5, temperature=1e-6))
    assert toks.shape == toks_ref.shape == (2, cfg.target_seq_len)
    np.testing.assert_array_equal(toks, toks_ref)


@pytest.mark.parametrize('thres', [0.5, 0.95])
def test_marginal_distribution_parity(dist_pair, thres):
    """Per-position marginals over 800 trajectories per side: pooled
    chi^2 (alpha~1e-4, 31 dof -> 66.6) + TV vs split-half noise.  At
    thres=0.95 the top-k cutoff keeps k=6 of 32 image logits on both
    sides (reference k over the FULL 136-token vocab, ours clamped to
    the image range — same live set)."""
    ref, params, cfg = dist_pair
    core = ArtvCore(cfg)
    # live-filter sanity: the k both sides derive from thres
    k = max(int((1 - thres) * cfg.total_tokens), 1)
    assert (k >= cfg.num_image_tokens) == (thres == 0.5)

    R = 800
    rng = np.random.RandomState(61)
    text = np.tile(rng.randint(1, 50, size=(1, 6)), (R, 1))
    visual = np.tile(rng.randint(0, 32, size=(1, cfg.visual_seq_len)),
                     (R, 1))

    toks_ref = _ref_sample(ref, text, visual, filter_thres=thres,
                           temperature=1.0, seed=81)
    toks = np.asarray(ar_sample(core, params, jnp.asarray(text),
                                jnp.asarray(visual),
                                jax.random.PRNGKey(82),
                                filter_thres=thres, temperature=1.0))
    assert toks.shape == toks_ref.shape == (R, cfg.target_seq_len)

    c_ref = _marginals(toks_ref, vocab=32)
    c_jax = _marginals(toks, vocab=32)
    chi2 = _chi2_stat(c_ref, c_jax)
    assert chi2 < 66.6, (
        f'AR marginal distributions differ (chi2={chi2:.1f} > 66.6)')

    half = _tv(_marginals(toks_ref[:R // 2], vocab=32),
               _marginals(toks_ref[R // 2:], vocab=32))
    cross = _tv(c_ref, c_jax)
    assert cross < max(1.3 * half, 0.10), (cross, half)
