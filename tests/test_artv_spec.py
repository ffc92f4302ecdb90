"""Speculative ART-V decode (models/artv_spec.py): exactness + wiring.

Speculative rejection sampling with a point-mass draft is exact by
construction — these tests pin the implementation to that guarantee:
greedy trajectories match the non-speculative decode token for token for
every chunk size, the sampled distribution matches the baseline's within
the parity suite's chi^2/TV bounds, the bench-only forced-acceptance
mode commits exactly k+1 tokens per step, and the MMVID_ARTV_SPEC env
opt-in routes ar_sample through the speculative path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.artv import ArtvConfig, ArtvCore, ar_sample
from mmvid_tpu.models.artv_spec import ar_sample_spec
from mmvid_tpu.models.clip import ClipStackConfig

CFG = ArtvConfig(dim=64, num_text_tokens=50, text_seq_len=6, num_visuals=1,
                 num_targets=2, num_image_tokens=1024, image_fmap_size=8,
                 image_size=32,
                 clip=ClipStackConfig(width=64, layers=2, heads=2))


@pytest.fixture(scope='module')
def setup():
    core = ArtvCore(CFG)
    rng = np.random.RandomState(3)
    text = jnp.asarray(rng.randint(1, 50, (2, 6)), jnp.int32)
    visual = jnp.asarray(rng.randint(0, 1024, (2, CFG.visual_seq_len)),
                         jnp.int32)
    params = core.init(jax.random.PRNGKey(0), text, visual,
                       jnp.zeros((2, CFG.target_seq_len), jnp.int32)
                       )['params']
    return core, params, text, visual


@pytest.mark.parametrize('k', [1, 4, 64])
def test_spec_greedy_matches_baseline(setup, k):
    """temperature->0: speculative and baseline rollouts are identical
    for any chunk size (fp32 tiny model -> exact argmax chains)."""
    core, params, text, visual = setup
    t_base = np.asarray(ar_sample(core, params, text, visual,
                                  jax.random.PRNGKey(1),
                                  temperature=1e-6))
    t_spec, steps = ar_sample_spec(core, params, text, visual,
                                   jax.random.PRNGKey(2), spec_k=k,
                                   temperature=1e-6)
    np.testing.assert_array_equal(np.asarray(t_spec), t_base)
    # every chunk commits at least one token
    assert int(np.asarray(steps).max()) <= CFG.target_seq_len - 1


def test_spec_force_commits_full_chunks(setup, monkeypatch):
    """MMVID_ARTV_SPEC_FORCE=1 (bench-only ceiling mode) accepts every
    draft: exactly ceil((n_gen-1)/(k+1)) chunk steps."""
    core, params, text, visual = setup
    monkeypatch.setenv('MMVID_ARTV_SPEC_FORCE', '1')
    for k in (4, 8):
        _, steps = ar_sample_spec(core, params, text, visual,
                                  jax.random.PRNGKey(2), spec_k=k)
        want = -(-(CFG.target_seq_len - 1) // (k + 1))
        assert np.asarray(steps).tolist() == [want, want]


def test_spec_env_opt_in_routes_ar_sample(setup, monkeypatch):
    """ar_sample with MMVID_ARTV_SPEC=k delegates to the speculative
    path and still produces the same greedy tokens."""
    core, params, text, visual = setup
    t_base = np.asarray(ar_sample(core, params, text, visual,
                                  jax.random.PRNGKey(1),
                                  temperature=1e-6))
    monkeypatch.setenv('MMVID_ARTV_SPEC', '4')
    t_spec = np.asarray(ar_sample(core, params, text, visual,
                                  jax.random.PRNGKey(9),
                                  temperature=1e-6))
    np.testing.assert_array_equal(t_spec, t_base)


def test_spec_scatter_write_identical(setup, monkeypatch):
    """MMVID_SPEC_SCATTER=0 (masked one-hot matmul + full-cache select,
    the measured-slower fallback) vs the default row-scatter cache write
    is a pure layout change: tokens and per-lane step counts are
    bit-identical at sampling temperature."""
    core, params, text, visual = setup
    t0, s0 = ar_sample_spec(core, params, text, visual,
                            jax.random.PRNGKey(11), spec_k=4,
                            temperature=1.0)
    monkeypatch.setenv('MMVID_SPEC_SCATTER', '0')
    t1, s1 = ar_sample_spec(core, params, text, visual,
                            jax.random.PRNGKey(11), spec_k=4,
                            temperature=1.0)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_artv_split_cache_layout_identical(setup, monkeypatch):
    """MMVID_ARTV_SPLIT=0 (stacked [n_layers, B, W, heads, hd] caches,
    the pre-round-5 layout) vs the default per-layer flat [B, W, D]
    tuple caches is a pure layout change in ar_sample: the attention
    einsums see the same values (the flat cache is reshaped back to
    heads for the contraction), so sampled tokens are bit-identical."""
    core, params, text, visual = setup
    t0 = ar_sample(core, params, text, visual, jax.random.PRNGKey(17),
                   temperature=1.0)
    monkeypatch.setenv('MMVID_ARTV_SPLIT', '0')
    t1 = ar_sample(core, params, text, visual, jax.random.PRNGKey(17),
                   temperature=1.0)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    # and with windowing off on both sides (single full-width scan)
    monkeypatch.setenv('MMVID_ARTV_WINDOW', '0')
    t2 = ar_sample(core, params, text, visual, jax.random.PRNGKey(17),
                   temperature=1.0)
    monkeypatch.setenv('MMVID_ARTV_SPLIT', '1')
    t3 = ar_sample(core, params, text, visual, jax.random.PRNGKey(17),
                   temperature=1.0)
    np.testing.assert_array_equal(np.asarray(t2), np.asarray(t3))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t2))


def test_spec_window_greedy_identical(setup, monkeypatch):
    """MMVID_SPEC_WINDOW=0 (single full-width loop) vs the default
    per-frame windowed segments: greedy trajectories and per-lane step
    counts are identical — windowing never discards commits, it only
    inserts idle iterations for lanes waiting at a segment stop (which
    greedy sampling ignores: acceptance is deterministic at T->0)."""
    core, params, text, visual = setup
    t0, s0 = ar_sample_spec(core, params, text, visual,
                            jax.random.PRNGKey(13), spec_k=4,
                            temperature=1e-6)
    monkeypatch.setenv('MMVID_SPEC_WINDOW', '0')
    t1, s1 = ar_sample_spec(core, params, text, visual,
                            jax.random.PRNGKey(13), spec_k=4,
                            temperature=1e-6)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_spec_window_sampled_identical_single_lane(setup, monkeypatch):
    """With one lane there is no cross-lane desync, so the windowed and
    full-width paths run the exact same chunk sequence AND key stream:
    sampled tokens are bit-identical, not just equal in distribution."""
    core, params, text, visual = setup
    t0, s0 = ar_sample_spec(core, params, text[:1], visual[:1],
                            jax.random.PRNGKey(17), spec_k=4,
                            temperature=1.0)
    monkeypatch.setenv('MMVID_SPEC_WINDOW', '0')
    t1, s1 = ar_sample_spec(core, params, text[:1], visual[:1],
                            jax.random.PRNGKey(17), spec_k=4,
                            temperature=1.0)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


@pytest.mark.slow
def test_spec_distribution_preserved():
    """T=1 sampling: 800 speculative vs 800 baseline trajectories on a
    32-vocab model pass the parity suite's chi^2 (alpha~1e-4, 31 dof ->
    66.6) and TV-vs-split-half bounds — speculative rejection sampling
    reproduces the target distribution, not an approximation of it."""
    from test_sampler_parity import _chi2_stat, _marginals, _tv

    cfg = ArtvConfig(dim=64, num_text_tokens=50, text_seq_len=6,
                     num_visuals=1, num_targets=2, num_image_tokens=32,
                     image_fmap_size=4, image_size=16,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    core = ArtvCore(cfg)
    R = 800
    rng = np.random.RandomState(7)
    text = jnp.asarray(np.tile(rng.randint(1, 50, (1, 6)), (R, 1)),
                       jnp.int32)
    visual = jnp.asarray(
        np.tile(rng.randint(0, 32, (1, cfg.visual_seq_len)), (R, 1)),
        jnp.int32)
    params = core.init(jax.random.PRNGKey(0), text[:1], visual[:1],
                       jnp.zeros((1, cfg.target_seq_len), jnp.int32)
                       )['params']

    t_base = np.asarray(ar_sample(core, params, text, visual,
                                  jax.random.PRNGKey(5), temperature=1.0))
    t_spec, _ = ar_sample_spec(core, params, text, visual,
                               jax.random.PRNGKey(6), spec_k=4,
                               temperature=1.0)
    t_spec = np.asarray(t_spec)

    c_base = _marginals(t_base, vocab=32)
    c_spec = _marginals(t_spec, vocab=32)
    chi2 = _chi2_stat(c_base, c_spec)
    assert chi2 < 66.6, f'speculative distribution drifted (chi2={chi2:.1f})'
    half = _tv(_marginals(t_base[:R // 2], vocab=32),
               _marginals(t_base[R // 2:], vocab=32))
    cross = _tv(c_base, c_spec)
    assert cross < max(1.3 * half, 0.10), (cross, half)
