"""Mask-predict sampler: schedule parity, weighted-sampling statistics,
preserve semantics, and the full generate_images pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.bert import BertConfig, BertCore
from mmvid_tpu.models.clip import ClipStackConfig
from mmvid_tpu.models.mmvid import DEFAULT_MP_CONFIG, MMVIDBert
from mmvid_tpu.models.sampler import (
    arrange_preserve_tokens,
    build_spec,
    make_schedules,
    mask_predict,
    preserve_layout,
)
from mmvid_tpu.models.vqgan import VQGanConfig, VQGanVAE

TINY_CFG = BertConfig(dim=64, num_text_tokens=50, text_seq_len=6,
                      num_visuals=0, num_targets=2, num_image_tokens=1024,
                      image_fmap_size=8, image_size=16,
                      clip=ClipStackConfig(width=64, layers=2, heads=2))


def reference_schedules(mp, N, steps=0):
    """Independent re-computation of dalle_bert.py:589-614."""
    Tmax = mp['T'] if steps <= 0 else steps
    N3 = max(1, int(N * mp['N3_n']))
    N4 = max(1, int(N * mp['N4_n']))
    n = (list(N * np.linspace(mp['N1_n'], mp['N2_n'], mp['T1_n']))
         + list(N3 * np.ones(mp['T2_n'])) + list(N4 * np.ones(mp['T3_n'])))
    temp = (list(np.linspace(mp['N1_t'], mp['N2_t'], mp['T1_t']))
            + list(mp['N3_t'] * np.ones(mp['T2_t']))
            + list(mp['N4_t'] * np.ones(mp['T3_t'])))
    return list(map(int, n))[:Tmax], temp[:Tmax], Tmax


@pytest.mark.quick
def test_schedules_match_reference_formula():
    n, temp, Tmax = make_schedules(DEFAULT_MP_CONFIG, N=512, steps=0)
    n_ref, temp_ref, Tmax_ref = reference_schedules(DEFAULT_MP_CONFIG, 512)
    assert Tmax == Tmax_ref == 20
    assert list(n) == n_ref
    np.testing.assert_allclose(temp, temp_ref)

    n2, _, T2 = make_schedules(DEFAULT_MP_CONFIG, N=512, steps=30)
    assert T2 == 30 and len(n2) == 30


@pytest.mark.quick
def test_gumbel_topk_matches_weighted_sampling_without_replacement():
    """Inclusion frequencies of top-k(log w + G) must match sequential
    weighted sampling w/o replacement (what torch.multinomial does)."""
    w = np.array([0.6, 0.25, 0.1, 0.05])
    k = 2
    # exact inclusion probabilities by enumeration of ordered draws
    incl = np.zeros(4)
    for i in range(4):
        for j in range(4):
            if i == j:
                continue
            p = w[i] * (w[j] / (1 - w[i]))
            incl[i] += p
            incl[j] += p

    n_trials = 20000
    key = jax.random.PRNGKey(0)
    g = -jnp.log(-jnp.log(
        jax.random.uniform(key, (n_trials, 4), minval=1e-12, maxval=1.0)))
    scores = jnp.log(jnp.asarray(w))[None] + g
    order = jnp.argsort(-scores, axis=-1)
    chosen = np.asarray(order[:, :k])
    emp = np.bincount(chosen.reshape(-1), minlength=4) / n_trials
    np.testing.assert_allclose(emp, incl, atol=0.02)


@pytest.mark.quick
def test_preserve_layouts():
    cfg = TINY_CFG  # 2 frames x 64 tokens
    m, N = preserve_layout(cfg, 'long', t_overlap=1, has_preserve=True)
    assert m[:64].all() and not m[64:].any() and N == 64
    m, N = preserve_layout(cfg, 'long', t_overlap=1, has_preserve=False)
    assert not m.any() and N == 128
    m, N = preserve_layout(cfg, 'interp', t_overlap=0, has_preserve=True)
    assert m[:64].all() and not m[64:].any() and N == 64

    prev = jnp.arange(2 * 128, dtype=jnp.int32).reshape(2, 128) % 1024
    placed = arrange_preserve_tokens(cfg, prev, 'long', 1)
    np.testing.assert_array_equal(np.asarray(placed[:, :64]),
                                  np.asarray(prev[:, -64:]))
    assert (np.asarray(placed[:, 64:]) == cfg.mask_token).all()


@pytest.fixture(scope='module')
def tiny_core():
    core = BertCore(TINY_CFG)
    text = jnp.zeros((1, 6), jnp.int32)
    target = jnp.zeros((1, 128), jnp.int32)
    params = core.init(jax.random.PRNGKey(0), text, None, target)['params']
    return core, params


def _control(core, params, batch=2):
    text = jnp.ones((batch, 6), jnp.int32)
    return core.apply({'params': params}, text, None,
                      method=BertCore.control_embedding)


def test_mask_predict_shapes_and_range(tiny_core):
    core, params = tiny_core
    control = _control(core, params)
    pmask, N = preserve_layout(core.cfg, 'long', 1, False)
    spec = build_spec(DEFAULT_MP_CONFIG, N, steps=4, dynamic=False)
    toks = mask_predict(core, params, control, jax.random.PRNGKey(1), spec,
                        pmask)
    toks = np.asarray(toks)
    assert toks.shape == (2, 128)
    assert toks.min() >= 0 and toks.max() < 1024  # never [MASK]/[SEP]


def test_mask_predict_preserve_semantics(tiny_core):
    core, params = tiny_core
    control = _control(core, params)
    prev = jnp.asarray(
        np.random.RandomState(0).randint(0, 1024, (2, 128)), jnp.int32)
    pmask, N = preserve_layout(core.cfg, 'long', 1, True)
    ptoks = arrange_preserve_tokens(core.cfg, prev, 'long', 1)
    spec = build_spec(DEFAULT_MP_CONFIG, N, steps=4, dynamic=False)
    toks = np.asarray(mask_predict(core, params, control,
                                   jax.random.PRNGKey(2), spec, pmask,
                                   ptoks))
    # preserved slots (first frame) must be exactly the previous chunk's
    # last frame tokens
    np.testing.assert_array_equal(toks[:, :64], np.asarray(prev[:, -64:]))
    assert toks[:, 64:].max() < 1024


def test_mask_predict_dynamic_terminates(tiny_core):
    core, params = tiny_core
    control = _control(core, params, batch=1)
    pmask, N = preserve_layout(core.cfg, 'long', 1, False)
    spec = build_spec(DEFAULT_MP_CONFIG, N, steps=12, dynamic=True)
    toks = np.asarray(mask_predict(core, params, control,
                                   jax.random.PRNGKey(3), spec, pmask))
    assert toks.shape == (1, 128) and toks.max() < 1024


def test_mask_predict_trace(tiny_core):
    from mmvid_tpu.models.sampler import mask_predict_trace
    core, params = tiny_core
    control = _control(core, params, batch=2)
    pmask, N = preserve_layout(core.cfg, 'long', 1, False)
    spec = build_spec(DEFAULT_MP_CONFIG, N, steps=4, dynamic=False)
    trace, keeps, final = mask_predict_trace(core, params, control,
                                             jax.random.PRNGKey(5), spec,
                                             pmask)
    trace, keeps = np.asarray(trace), np.asarray(keeps)
    assert trace.shape == (4, 2, 128)  # step 0 + 3 refinement steps
    assert keeps.shape == (4, 2, 128) and keeps.dtype == bool
    assert not keeps[0].any()          # no preserve: everything starts masked
    assert keeps[1:].any(axis=(1, 2)).all()  # refinement keeps some tokens
    np.testing.assert_array_equal(trace[-1], np.asarray(final))
    assert trace.max() < 1024


def test_generate_images_end_to_end():
    vq_cfg = VQGanConfig(resolution=16, ch=32, ch_mult=(1, 2),
                         num_res_blocks=1, z_channels=64, embed_dim=64,
                         n_embed=1024, attn_resolutions=())
    vae = VQGanVAE(image_size=16, cfg=vq_cfg)
    model = MMVIDBert(TINY_CFG, vae)

    text = jnp.ones((2, 6), jnp.int32)
    videos, seq = model.generate_images(
        jax.random.PRNGKey(0), text, mask_predict_steps=3, dynamic=False)
    assert seq.shape == (2, 128)
    assert videos.shape == (2, 2, 16, 16, 3)
    assert float(videos.min()) >= 0.0 and float(videos.max()) <= 1.0


def test_generate_images_env_flags_key_trace_cache(monkeypatch):
    """Env perf flags are read at TRACE time, so toggling one on a live
    model must key a fresh trace instead of silently reusing the stale
    one (the CLAUDE.md stale-trace hazard). Uses decode=False to keep the
    two compiles cheap."""
    vq_cfg = VQGanConfig(resolution=16, ch=32, ch_mult=(1, 2),
                         num_res_blocks=1, z_channels=64, embed_dim=64,
                         n_embed=1024, attn_resolutions=())
    model = MMVIDBert(TINY_CFG, VQGanVAE(image_size=16, cfg=vq_cfg))
    text = jnp.ones((2, 6), jnp.int32)
    monkeypatch.delenv('MMVID_ATTN_HPB', raising=False)
    _, seq1 = model.generate_images(jax.random.PRNGKey(0), text,
                                    mask_predict_steps=2, dynamic=False,
                                    decode=False)
    assert len(model._gen_cache) == 1
    monkeypatch.setenv('MMVID_ATTN_HPB', '4')
    _, seq2 = model.generate_images(jax.random.PRNGKey(0), text,
                                    mask_predict_steps=2, dynamic=False,
                                    decode=False)
    assert len(model._gen_cache) == 2, 'env flag did not key the cache'
    # the flag only affects the Pallas kernel's grid, which is off here:
    # the re-trace must not change the sampled tokens
    np.testing.assert_array_equal(np.asarray(seq1), np.asarray(seq2))


def test_interpolation_doubles_frames():
    """Hierarchical interpolation: each level doubles the frame count and
    preserves the source frames at even slots."""
    from mmvid_tpu.utils.viz import generate_interpolated_video

    vq_cfg = VQGanConfig(resolution=16, ch=32, ch_mult=(1, 2),
                         num_res_blocks=1, z_channels=64, embed_dim=64,
                         n_embed=1024, attn_resolutions=())
    vae = VQGanVAE(image_size=16, cfg=vq_cfg)
    model = MMVIDBert(TINY_CFG, vae)
    text = jnp.ones((1, 6), jnp.int32)

    source = jnp.asarray(
        np.random.RandomState(0).randint(0, 1024, (1, 128)), jnp.int32)
    mp = dict(DEFAULT_MP_CONFIG, T=2)
    for levels, frames in ((1, 4), (2, 8)):
        video = generate_interpolated_video(
            model, jax.random.PRNGKey(1), text, source_tokens=source,
            levels=levels, mask_predict_steps=2, mp_config=mp)
        assert video.shape == (1, frames, 16, 16, 3), levels


def test_generate_images_long_chunking():
    """Sliding-window extrapolation: second chunk preserves first chunk's
    last frame tokens (utils_train.py:1337-1373 semantics)."""
    vq_cfg = VQGanConfig(resolution=16, ch=32, ch_mult=(1, 2),
                         num_res_blocks=1, z_channels=64, embed_dim=64,
                         n_embed=1024, attn_resolutions=())
    vae = VQGanVAE(image_size=16, cfg=vq_cfg)
    model = MMVIDBert(TINY_CFG, vae)
    text = jnp.ones((1, 6), jnp.int32)

    _, seq1 = model.generate_images(jax.random.PRNGKey(1), text,
                                    mask_predict_steps=2, dynamic=False,
                                    decode=False)
    _, seq2 = model.generate_images(jax.random.PRNGKey(2), text,
                                    mask_predict_steps=2, dynamic=False,
                                    preserve=seq1, t_overlap=1,
                                    long_mode='long', decode=False)
    np.testing.assert_array_equal(np.asarray(seq2[:, :64]),
                                  np.asarray(seq1[:, -64:]))


@pytest.mark.quick
def test_chain_beam_updates_matches_reference_semantics():
    """chain_beam_updates must reproduce dalle_bert.py:675-693 exactly:
    beam j's update composes on beam j-1's chained state; the selected
    state is the chained value AT the best beam."""
    from mmvid_tpu.models.sampler import chain_beam_updates
    rng = np.random.RandomState(0)
    J, b, N = 3, 2, 5
    Y0 = rng.uniform(size=(b, N)).astype(np.float32)
    I0 = rng.randint(0, 100, (b, N)).astype(np.int32)
    keep = rng.rand(J, b, N) < 0.5
    Yn = rng.uniform(size=(J, b, N)).astype(np.float32)
    In = rng.randint(0, 100, (J, b, N)).astype(np.int32)
    S = rng.uniform(size=(J, b)).astype(np.float32)

    # straight python port of the reference chaining
    Y, I = Y0.copy(), I0.copy()
    YB, IB = [], []
    for j in range(J):
        Y = np.where(keep[j], Y, Yn[j])
        I = np.where(keep[j], I, In[j])
        YB.append(Y.copy())
        IB.append(I.copy())
    jmax = S.argmax(axis=0)
    exp_S = S[jmax, np.arange(b)]
    exp_Y = np.stack([YB[jmax[i]][i] for i in range(b)])
    exp_I = np.stack([IB[jmax[i]][i] for i in range(b)])

    got_S, got_Y, got_I = chain_beam_updates(
        jnp.asarray(Y0), jnp.asarray(I0), jnp.asarray(keep),
        jnp.asarray(Yn), jnp.asarray(In), jnp.asarray(S))
    np.testing.assert_allclose(np.asarray(got_S), exp_S, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_Y), exp_Y, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_I), exp_I)


def test_mask_predict_beams(tiny_core):
    """B=3 beams: valid tokens, deterministic per key, differs from B=1."""
    core, params = tiny_core
    control = _control(core, params, batch=2)
    pmask, N = preserve_layout(core.cfg, 'long', 1, False)
    cfg3 = dict(DEFAULT_MP_CONFIG, B=3)
    spec3 = build_spec(cfg3, N, steps=6, dynamic=True)
    spec1 = build_spec(DEFAULT_MP_CONFIG, N, steps=6, dynamic=True)
    t3 = np.asarray(mask_predict(core, params, control,
                                 jax.random.PRNGKey(9), spec3, pmask))
    t3b = np.asarray(mask_predict(core, params, control,
                                  jax.random.PRNGKey(9), spec3, pmask))
    t1 = np.asarray(mask_predict(core, params, control,
                                 jax.random.PRNGKey(9), spec1, pmask))
    assert t3.shape == (2, 128) and t3.max() < 1024
    np.testing.assert_array_equal(t3, t3b)
    assert not np.array_equal(t3, t1)
