"""Training step, multi-chip dry run, and checkpointing."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.bert import BertConfig
from mmvid_tpu.models.clip import ClipStackConfig
from mmvid_tpu.models.mmvid import MMVIDBert
from mmvid_tpu.models.vqgan import VQGanConfig, VQGanVAE
from mmvid_tpu.training import (
    TrainConfig,
    create_train_state,
    jit_train_step,
    make_train_step,
)


@pytest.fixture(scope='module')
def tiny_model():
    vq_cfg = VQGanConfig(resolution=16, ch=32, ch_mult=(1, 2),
                         num_res_blocks=1, z_channels=64, embed_dim=64,
                         n_embed=1024, attn_resolutions=())
    vae = VQGanVAE(image_size=16, cfg=vq_cfg)
    cfg = BertConfig(dim=64, num_text_tokens=100, text_seq_len=8,
                     num_visuals=0, num_targets=2, num_image_tokens=1024,
                     image_fmap_size=8, image_size=16,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    return MMVIDBert(cfg, vae)


def _batch(b=2):
    rng = np.random.RandomState(0)
    return {
        'text': jnp.asarray(rng.randint(1, 100, (b, 8)), jnp.int32),
        'target': jnp.asarray(rng.uniform(0, 1, (b, 2, 16, 16, 3)),
                              jnp.float32),
    }


def test_full_loss_with_vid_warp(tiny_model):
    """The full 3-loss path incl. pixel-space warp + in-step VQGAN encode."""
    tc = TrainConfig(beta_rel=0.5, beta_vid=0.5, lr_scheduler_warmup=2,
                     dropout_vc=0.0)
    msm, rel, vid = tiny_model.loss(
        tiny_model.params, jax.random.PRNGKey(0), text=_batch()['text'],
        target=_batch()['target'], rel=True, vid=True,
        msm_strategy_prob=tc.msm_strategy_prob)
    for name, val in [('msm', msm), ('rel', rel), ('vid', vid)]:
        assert np.isfinite(float(val)), f'{name} not finite'
        # CE/BCE losses are nonnegative by construction; random-init model
        # over 1024 classes lands near log(1024)~6.9 for MSM, log(2)~0.7*2
        # for the BCE pairs
        assert 0.0 <= float(val) < 30.0, f'{name} out of range: {float(val)}'
    assert float(vid) > 0.0  # VID branch actually ran


@pytest.fixture(scope='module')
def tiny_visual_model():
    vq_cfg = VQGanConfig(resolution=16, ch=32, ch_mult=(1, 2),
                         num_res_blocks=1, z_channels=64, embed_dim=64,
                         n_embed=1024, attn_resolutions=())
    vae = VQGanVAE(image_size=16, cfg=vq_cfg)
    cfg = BertConfig(dim=64, num_text_tokens=100, text_seq_len=8,
                     num_visuals=1, num_targets=2, num_image_tokens=1024,
                     image_fmap_size=8, image_size=16,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    return MMVIDBert(cfg, vae)


def test_dropout_vc_substitutes_fully_masked_visual(tiny_visual_model):
    """dropout_vc must reproduce the reference's visual=None path (fully
    [MASK] visual tokens, dalle_bert.py:954-958), not zeroed pixels; and
    fullvc must disable the drop entirely (reference train.py:300-302)."""
    model = tiny_visual_model
    rng = np.random.RandomState(1)
    b = 2
    batch = {
        'text': jnp.asarray(rng.randint(1, 100, (b, 8)), jnp.int32),
        'target': jnp.asarray(rng.uniform(0, 1, (b, 2, 16, 16, 3)),
                              jnp.float32),
        'visual': jnp.asarray(rng.uniform(0, 1, (b, 1, 16, 16, 3)),
                              jnp.float32),
    }
    key = jax.random.PRNGKey(7)

    # dropped visual == visual=None path, loss-for-loss
    dropped = model.loss(model.params, key, text=batch['text'],
                         visual=batch['visual'],
                         visual_drop=jnp.bool_(True),
                         target=batch['target'], rel=True, vid=False)
    none_path = model.loss(model.params, key, text=batch['text'],
                           visual=None, target=batch['target'],
                           rel=True, vid=False)
    for a, c in zip(dropped, none_path):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5)

    # not-dropped == plain visual path
    kept = model.loss(model.params, key, text=batch['text'],
                      visual=batch['visual'],
                      visual_drop=jnp.bool_(False),
                      target=batch['target'], rel=True, vid=False)
    plain = model.loss(model.params, key, text=batch['text'],
                       visual=batch['visual'], target=batch['target'],
                       rel=True, vid=False)
    for a, c in zip(kept, plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5)
    assert abs(float(dropped[0]) - float(kept[0])) > 1e-6

    # fullvc=True: the train step never draws a drop
    from mmvid_tpu.training import make_train_step
    tc = TrainConfig(dropout_vc=1.0, fullvc=True, beta_rel=0.5,
                     beta_vid=0.0, lr_scheduler_warmup=2)
    step = jax.jit(make_train_step(model, tc))
    state = create_train_state(model, tc)
    _, m_full = step(state, batch, jax.random.PRNGKey(3))
    tc_drop = TrainConfig(dropout_vc=1.0, fullvc=False, beta_rel=0.5,
                          beta_vid=0.0, lr_scheduler_warmup=2)
    step_d = jax.jit(make_train_step(model, tc_drop))
    state_d = create_train_state(model, tc_drop)
    _, m_drop = step_d(state_d, batch, jax.random.PRNGKey(3))
    assert abs(float(m_full['loss']) - float(m_drop['loss'])) > 1e-6, \
        'dropout_vc=1.0 with fullvc must behave differently from without'


def test_adam_weight_decay_is_l2(tiny_model):
    """--optimizer adam --weight_decay x must decay params (torch Adam L2,
    utils/utils_train.py:167-182), not be silently dropped."""
    from mmvid_tpu.training import make_optimizer
    tc0 = TrainConfig(optimizer='adam', weight_decay=0.0,
                      lr_scheduler='none')
    tc1 = TrainConfig(optimizer='adam', weight_decay=0.1,
                      lr_scheduler='none')
    params = {'w': jnp.ones((4,)) * 2.0}
    grads = {'w': jnp.ones((4,)) * -0.01}
    import optax

    def one_update(tc):
        tx = make_optimizer(tc)
        st = tx.init(params)
        upd, _ = tx.update(grads, st, params, value=jnp.float32(1.0))
        return optax.apply_updates(params, upd)

    no_decay = one_update(tc0)
    with_decay = one_update(tc1)
    # L2 term (wd*param = 0.2 >> |grad| 0.01) flips the Adam direction:
    # without decay params grow (negative grad); with decay they shrink.
    assert float(no_decay['w'][0]) > 2.0
    assert float(with_decay['w'][0]) < float(no_decay['w'][0])


def test_unknown_scheduler_raises():
    from mmvid_tpu.training import make_lr_schedule
    with pytest.raises(ValueError, match='unknown lr_scheduler'):
        make_lr_schedule(TrainConfig(lr_scheduler='bogus'))


def test_reduce_on_plateau_halves_lr():
    """reducelronplateau (factor .5, patience 2, cooldown 5, min_lr 1e-6;
    utils/utils_train.py:314-335) must actually reduce the update scale
    when the loss plateaus."""
    import optax
    from mmvid_tpu.training import make_optimizer
    tc = TrainConfig(optimizer='adam', lr_scheduler='reducelronplateau',
                     learning_rate=1e-2, lr_scheduler_every=1)
    tx = make_optimizer(tc)
    params = {'w': jnp.ones((2,))}
    grads = {'w': jnp.ones((2,))}
    st = tx.init(params)

    def scale_of(state):
        leaves = jax.tree_util.tree_leaves(
            [getattr(s, 'scale', None) for s in jax.tree_util.tree_leaves(
                state, is_leaf=lambda x: hasattr(x, 'scale'))])
        return float(leaves[0]) if leaves else None

    # constant loss -> plateau -> scale drops below 1 within a few checks
    for i in range(12):
        upd, st = tx.update(grads, st, params, value=jnp.float32(5.0))
    s = scale_of(st)
    assert s is not None and s < 1.0, f'plateau scale not reduced: {s}'


def test_train_step_improves_loss(tiny_model):
    tc = TrainConfig(learning_rate=3e-3, beta_msm=1.0, beta_rel=0.0,
                     beta_vid=0.0, lr_scheduler='none', dropout_vc=0.0,
                     msm_strategy_prob=(1.0, 0.0, 0.0, 0.0),
                     msm_bernoulli_prob=(0.3, 0.3))
    step = jax.jit(make_train_step(tiny_model, tc))
    state = create_train_state(tiny_model, tc)
    batch = _batch()
    first = None
    for i in range(12):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
        if first is None:
            first = float(metrics['loss_msm'])
    last = float(metrics['loss_msm'])
    assert last < first, f'MSM loss did not improve: {first} -> {last}'
    assert int(state.step) == 12


def test_lr_schedules():
    from mmvid_tpu.training import make_lr_schedule
    tc = TrainConfig(learning_rate=1e-4, lr_scheduler='warmuplr',
                     lr_scheduler_warmup=100)
    s = make_lr_schedule(tc)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(100)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(s(10000)), 1e-4, rtol=1e-5)

    tc2 = TrainConfig(lr_scheduler='warmupdecaylr', lr_scheduler_warmup=10,
                      total_steps=110)
    s2 = make_lr_schedule(tc2)
    np.testing.assert_allclose(float(s2(10)), 1e-4, rtol=1e-5)
    assert float(s2(110)) < 1e-6


def test_dryrun_multichip_8():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import dryrun_multichip
    assert len(jax.devices()) >= 8
    dryrun_multichip(8)


def test_dryrun_multichip_subprocess_hostile_env():
    """The round-1 driver failure mode: dryrun_multichip is invoked in a
    fresh process WITHOUT the conftest platform pinning (and with an env
    that may point at a real 1-chip TPU).  The hook must self-pin the
    virtual CPU platform before any jax usage."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # Simulate the driver: no virtual-device flags, ambient platform unset.
    env.pop('XLA_FLAGS', None)
    env.pop('JAX_PLATFORMS', None)
    out = subprocess.run(
        [sys.executable, '-c',
         'from __graft_entry__ import dryrun_multichip;'
         'dryrun_multichip(8)'],
        # 242s idle-host; 1800s headroom because the full suite saturates
        # the 1-core host and this subprocess compiles the whole multichip
        # lifecycle (measured >600s under that contention).
        cwd=repo, env=env, capture_output=True, text=True, timeout=1800)
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'dryrun_multichip(8)' in out.stdout


def test_checkpoint_roundtrip(tiny_model, tmp_path):
    from mmvid_tpu.utils.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )
    log_dir = str(tmp_path / 'run')
    tree = {'step': 7, 'params': tiny_model.params}
    save_checkpoint(log_dir, 7, tree, hparams={'dim': 64})
    save_checkpoint(log_dir, 12, tree, hparams={'dim': 64})
    path = latest_checkpoint(log_dir)
    assert path.endswith('12')
    loaded, hparams = load_checkpoint(path)
    assert hparams == {'dim': 64}
    a = jax.tree_util.tree_leaves(tiny_model.params)[0]
    b = jax.tree_util.tree_leaves(loaded['params'])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_restores_optimizer_state_bitwise(tiny_model, tmp_path):
    """Save at step 3, restore into a fresh state, continue to step 6: the
    trajectory must be bitwise-identical to an uninterrupted run (reference
    checkpoints include 'optimizer', utils/utils_train.py:297-305)."""
    from mmvid_tpu.training import (
        make_train_step, opt_state_from_leaves, opt_state_leaves)
    from mmvid_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    tc = TrainConfig(learning_rate=1e-3, beta_rel=0.0, beta_vid=0.0,
                     lr_scheduler='warmuplr', lr_scheduler_warmup=4,
                     dropout_vc=0.0)
    step = jax.jit(make_train_step(tiny_model, tc))
    base = jax.random.PRNGKey(42)
    batch = _batch()

    # uninterrupted
    state = create_train_state(tiny_model, tc)
    for i in range(6):
        state, _ = step(state, batch, jax.random.fold_in(base, i))
    ref_params = jax.device_get(state.params)

    # interrupted at 3
    state = create_train_state(tiny_model, tc)
    for i in range(3):
        state, _ = step(state, batch, jax.random.fold_in(base, i))
    tree = {'step': 3, 'params': jax.device_get(state.params),
            'opt_state': opt_state_leaves(jax.device_get(state.opt_state))}
    save_checkpoint(str(tmp_path / 'run'), 3, tree)

    loaded, _ = load_checkpoint(str(tmp_path / 'run' / 'weights' / '3'))
    fresh = create_train_state(tiny_model, tc)
    resumed = fresh.replace(
        params=loaded['params'],
        opt_state=opt_state_from_leaves(fresh.opt_state,
                                        loaded['opt_state']),
        step=jnp.asarray(int(np.asarray(loaded['step'])), jnp.int32))
    for i in range(3, 6):
        resumed, _ = step(resumed, batch, jax.random.fold_in(base, i))
    got = jax.device_get(resumed.params)

    flat_a = jax.tree_util.tree_flatten_with_path(ref_params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(got)[0]
    for (kp, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f'not bitwise equal at {jax.tree_util.keystr(kp)}')


@pytest.mark.quick
def test_async_checkpoint_writer_surfaces_errors(tmp_path):
    """A failed background write must raise on the next submit()/wait(),
    not vanish (train.py relies on this to not silently lose checkpoints)."""
    from mmvid_tpu.utils.checkpoint import (
        AsyncCheckpointWriter,
        load_checkpoint,
    )

    w = AsyncCheckpointWriter()
    w.submit(str(tmp_path / 'run'), 1, {'step': 1, 'params': {'x': 1.0}})
    w.wait()
    tree, _ = load_checkpoint(str(tmp_path / 'run' / 'weights' / '1'))
    assert tree['step'] == 1

    # unwritable target -> the exception surfaces on wait()
    blocked = tmp_path / 'blocked'
    blocked.write_text('a file, not a dir')
    w.submit(str(blocked / 'sub'), 2, {'step': 2})
    with pytest.raises(Exception):
        w.wait()
    # the writer stays usable afterwards
    w.submit(str(tmp_path / 'run'), 3, {'step': 3, 'params': {'x': 2.0}})
    w.wait()
    assert (tmp_path / 'run' / 'weights' / '3').exists()
