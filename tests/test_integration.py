"""Cross-cutting integration tests: negvc REL, beam search, the FVD/PRD
pipeline end-to-end, and dp-vs-tp sharding numerical equivalence."""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.bert import BertConfig, BertCore, bert_losses
from mmvid_tpu.models.clip import ClipStackConfig
from mmvid_tpu.models.mmvid import DEFAULT_MP_CONFIG, MMVIDBert
from mmvid_tpu.models.sampler import build_spec, mask_predict, preserve_layout
from mmvid_tpu.models.vqgan import VQGanConfig, VQGanVAE

CFG = BertConfig(dim=64, num_text_tokens=100, text_seq_len=8,
                 num_visuals=1, num_targets=2, num_image_tokens=1024,
                 image_fmap_size=8, image_size=16,
                 clip=ClipStackConfig(width=64, layers=2, heads=2))


@pytest.fixture(scope='module')
def model():
    vq = VQGanConfig(resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     z_channels=64, embed_dim=64, n_embed=1024,
                     attn_resolutions=())
    vae = VQGanVAE(image_size=16, cfg=vq)
    return MMVIDBert(CFG, vae)


def test_negvc_rel_loss(model):
    """Explicit loader-provided negatives drive the REL head.

    The negative control now matches the reference layout exactly
    (dalle_bert.py:909-935,974-975): `[REL]+text_neg+[ST1][VID]` with the
    visual segment DROPPED from the negative sequence — see
    models/bert.py:385-416 (drop_visual) and the oracle parity test
    tests/test_clip_bert.py::test_bert_losses_parity_negvc."""
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(1, 100, (2, 8)), jnp.int32)
    text_neg = jnp.asarray(rng.randint(1, 100, (2, 8)), jnp.int32)
    target = jnp.asarray(rng.uniform(0, 1, (2, 2, 16, 16, 3)), jnp.float32)

    msm, rel, vid = model.loss(
        model.params, jax.random.PRNGKey(0), text=text, target=target,
        rel=True, vid=False, negvc=True, text_neg=text_neg)
    assert np.isfinite(float(rel)) and float(rel) > 0
    assert 0 <= float(msm) < 30


def test_mask_predict_with_beams(model):
    core, params = model.core, model.params
    text = jnp.ones((2, 8), jnp.int32)
    control = core.apply({'params': params}, text,
                         model.fully_masked_visual(2),
                         method=BertCore.control_embedding)
    pmask, N = preserve_layout(CFG, 'long', 1, False)
    mp = dict(DEFAULT_MP_CONFIG, B=2)
    spec = build_spec(mp, N, steps=3, dynamic=False)
    assert spec.beams == 2
    toks = np.asarray(mask_predict(core, params, control,
                                   jax.random.PRNGKey(1), spec, pmask))
    assert toks.shape == (2, CFG.target_seq_len)
    assert toks.max() < 1024


def test_evaluate_pipeline_end_to_end(model, tmp_path):
    """The whole FVD+PRD loop with a random-weight I3D on tiny clips."""
    from mmvid_tpu.eval.evaluate import evaluate

    rng = np.random.RandomState(1)

    def batches():
        while True:
            yield {
                'text': rng.randint(1, 100, (2, 8)).astype(np.int32),
                'target': rng.uniform(0, 1, (2, 2, 16, 16, 3)
                                      ).astype(np.float32),
                'visual': rng.uniform(0, 1, (2, 1, 16, 16, 3)
                                      ).astype(np.float32),
            }

    args = types.SimpleNamespace(
        log_metric_dir=str(tmp_path / 'metrics'), seed=0, num_targets=2,
        eval_num=4, batch_size=2, mask_predict_steps=[2],
        pnag_dynamic=False, mp_config=DEFAULT_MP_CONFIG)
    # without I3D weights and without the explicit opt-in, evaluate refuses
    import pytest
    with pytest.raises(RuntimeError, match='I3D'):
        evaluate(args, model, batches(), metrics=('fvd',))
    args.allow_random_i3d = True
    results = evaluate(args, model, batches(), metrics=('fvd', 'prd'))
    assert np.isfinite(results['fvd'])
    f8, f18 = results['prd']
    assert 0 <= f8 <= 1 and 0 <= f18 <= 1
    assert (tmp_path / 'metrics' / 'fvd_score.txt').exists()
    assert (tmp_path / 'metrics' / 'real_embs.npy').exists()
    # the score artifact records the actual sample count (VERDICT r2 #9)
    txt = (tmp_path / 'metrics' / 'fvd_score.txt').read_text()
    assert 'n_samples = 4' in txt


def test_evaluate_truncation_logged(model, tmp_path, capsys):
    """eval_num not divisible by batch under-samples — that must be
    visible in stdout AND the fvd_score.txt artifact (no silent caps)."""
    from mmvid_tpu.eval.evaluate import evaluate

    rng = np.random.RandomState(7)

    def batches():
        while True:
            yield {
                'text': rng.randint(1, 100, (2, 8)).astype(np.int32),
                'target': rng.uniform(0, 1, (2, 2, 16, 16, 3)
                                      ).astype(np.float32),
            }

    args = types.SimpleNamespace(
        log_metric_dir=str(tmp_path / 'metrics3'), seed=0, num_targets=2,
        eval_num=5, batch_size=2, mask_predict_steps=[2],
        pnag_dynamic=False, mp_config=DEFAULT_MP_CONFIG,
        allow_random_i3d=True)
    evaluate(args, model, batches(), metrics=('fvd',))
    out = capsys.readouterr().out
    assert 'eval_num=5' in out and 'using 4 samples' in out
    txt = (tmp_path / 'metrics3' / 'fvd_score.txt').read_text()
    assert 'n_samples = 4' in txt


def test_evaluate_mixed_clip_lengths(model, tmp_path):
    """Real clips longer than num_targets (independent flags frame_num vs
    num_targets): extension indices must follow each SOURCE's length
    (regression: a single num_targets-based index set embedded only the
    first num_targets frames of real clips)."""
    from mmvid_tpu.eval.evaluate import evaluate

    rng = np.random.RandomState(2)

    def batches():
        while True:
            yield {
                'text': rng.randint(1, 100, (2, 8)).astype(np.int32),
                # real clips have 5 frames; the model generates 2
                'target': rng.uniform(0, 1, (2, 5, 16, 16, 3)
                                      ).astype(np.float32),
            }

    args = types.SimpleNamespace(
        log_metric_dir=str(tmp_path / 'metrics2'), seed=0, num_targets=2,
        eval_num=2, batch_size=2, mask_predict_steps=[2],
        pnag_dynamic=False, mp_config=DEFAULT_MP_CONFIG,
        allow_random_i3d=True)
    results = evaluate(args, model, batches(), metrics=('fvd',))
    assert np.isfinite(results['fvd'])


def test_dp_tp_numerical_equivalence(model):
    """The same batch gives the same loss under dp=8 and dp=4,tp=2."""
    from mmvid_tpu.parallel.mesh import make_mesh
    from mmvid_tpu.training import (
        TrainConfig,
        create_train_state,
        jit_train_step,
    )

    tc = TrainConfig(beta_rel=0.0, beta_vid=0.0, dropout_vc=0.0,
                     msm_strategy_prob=(0.0, 1.0, 0.0, 0.0))
    rng = np.random.RandomState(2)
    batch = {
        'text': jnp.asarray(rng.randint(1, 100, (8, 8)), jnp.int32),
        'target': jnp.asarray(rng.uniform(0, 1, (8, 2, 16, 16, 3)),
                              jnp.float32),
    }
    losses = {}
    for spec in ('dp=8,tp=1', 'dp=4,tp=2'):
        mesh = make_mesh(spec)
        step = jit_train_step(model, tc, mesh=mesh)
        state = step.shard_state(create_train_state(model, tc))
        with mesh:
            _, m = step(state, dict(batch), jax.random.PRNGKey(3))
        losses[spec] = float(m['loss'])
    np.testing.assert_allclose(losses['dp=8,tp=1'], losses['dp=4,tp=2'],
                               rtol=1e-4)
