"""Statistical correctness of the sampler's primitive distributions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.sampler import _gumbel, _sample_multinomial


def test_sample_multinomial_zero_temp_is_categorical():
    """With temperature 0 (the default mp schedule), tokens are exact
    categorical draws from softmax(logits) and Y is the chosen token's
    softmax probability."""
    logits = jnp.asarray([[ [2.0, 1.0, 0.0, -1.0] ]])   # [1, 1, 4]
    probs = np.asarray(jax.nn.softmax(logits[0, 0]))

    n = 8000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    sample = jax.jit(lambda k: _sample_multinomial(k, logits, 0.0))
    toks = np.array([int(sample(k)[1][0, 0]) for k in keys[:0]])  # warm
    ys, toks = [], []
    batched = jax.vmap(lambda k: _sample_multinomial(k, logits, 0.0))
    y_all, t_all = batched(keys)
    toks = np.asarray(t_all[:, 0, 0])
    ys = np.asarray(y_all[:, 0, 0])

    freq = np.bincount(toks, minlength=4) / n
    np.testing.assert_allclose(freq, probs, atol=0.02)
    # Y equals the softmax prob of the sampled token
    np.testing.assert_allclose(ys, probs[toks], rtol=1e-5)


def test_sample_multinomial_temperature_flattens():
    """Higher temperature adds gumbel noise -> flatter empirical dist."""
    logits = jnp.asarray([[[3.0, 0.0, 0.0, 0.0]]])
    n = 6000
    keys = jax.random.split(jax.random.PRNGKey(1), n)

    def freq_at(temp):
        batched = jax.vmap(lambda k: _sample_multinomial(k, logits, temp))
        _, t_all = batched(keys)
        return np.bincount(np.asarray(t_all[:, 0, 0]), minlength=4) / n

    f0 = freq_at(0.0)
    f2 = freq_at(2.0)
    assert f2[0] < f0[0]          # the peak flattens
    assert f2[1:].sum() > f0[1:].sum()


def test_gumbel_moments():
    g = np.asarray(_gumbel(jax.random.PRNGKey(2), (200000,)))
    # Gumbel(0,1): mean = Euler-Mascheroni, var = pi^2/6
    np.testing.assert_allclose(g.mean(), 0.5772, atol=0.02)
    np.testing.assert_allclose(g.var(), np.pi ** 2 / 6, rtol=0.05)
