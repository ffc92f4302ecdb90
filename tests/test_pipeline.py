"""Pipeline-parallel (pp) and sequence-parallel (sp) backbone tests.

The reference implements data parallelism only (SURVEY.md §2.3); the pp/sp
axes are beyond-parity TPU work.  These tests pin down the two properties
that matter: (1) the GPipe pipelined stack computes EXACTLY what the
sequential stack computes, (2) the full train step over a dp x pp x tp mesh
produces the same loss as the dp-only step, so turning on model parallelism
never changes optimization.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvid_tpu.models.clip import (
    ClipStackConfig,
    TransformerStack,
    build_attention_mask,
)
from mmvid_tpu.parallel.pipeline import (
    adapt_stack_layout,
    stack_block_params,
    unstack_block_params,
)

def _stacks(layers=4, width=64, heads=2, stages=2, micro=2):
    cfg = ClipStackConfig(width=width, layers=layers, heads=heads)
    pcfg = dataclasses.replace(cfg, pipeline_stages=stages,
                               pipeline_microbatches=micro)
    return TransformerStack(cfg), TransformerStack(pcfg)


@pytest.mark.quick
def test_pipelined_stack_matches_sequential():
    seq, pipe = _stacks()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 64))
    mask = build_attention_mask(16, 'causal')
    p = seq.init(jax.random.PRNGKey(0), x, mask)['params']
    y_seq = seq.apply({'params': p}, x, mask)
    y_pipe = pipe.apply({'params': stack_block_params(p, 4)}, x, mask)
    np.testing.assert_allclose(np.asarray(y_seq), np.asarray(y_pipe),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.quick
def test_pipelined_stack_odd_batch_clamps_microbatches():
    # init traces with batch 1; microbatch count clamps to a divisor
    seq, pipe = _stacks(micro=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 64))
    p = seq.init(jax.random.PRNGKey(0), x, None)['params']
    y_seq = seq.apply({'params': p}, x, None)
    y_pipe = pipe.apply({'params': stack_block_params(p, 4)}, x, None)
    # not bit-exact: the microbatch slicing changes XLA's matmul tiling
    np.testing.assert_allclose(np.asarray(y_seq), np.asarray(y_pipe),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.quick
def test_stack_unstack_roundtrip():
    seq, pipe = _stacks()
    x = jnp.zeros((1, 8, 64))
    p = pipe.init(jax.random.PRNGKey(0), x, None)['params']
    assert set(p) == {'blocks'}
    un = unstack_block_params(p, 4)
    assert set(un) == {f'blocks_{i}' for i in range(4)}
    re = stack_block_params(un, 4)
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(re)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # adapt_stack_layout dispatches on the tree's current layout
    full = {'transformer': p, 'other': jnp.ones((2,))}
    down = adapt_stack_layout(full, 4, pipelined=False)
    assert 'blocks_0' in down['transformer']
    up = adapt_stack_layout(down, 4, pipelined=True)
    assert 'blocks' in up['transformer']
    same = adapt_stack_layout(up, 4, pipelined=True)
    assert same['transformer'] is up['transformer']


def _tiny_models(pipeline_stages, seq_parallel=False):
    from mmvid_tpu.models.bert import BertConfig
    from mmvid_tpu.models.mmvid import MMVIDBert
    from mmvid_tpu.models.vqgan import VQGanConfig, VQGanVAE

    vq_cfg = VQGanConfig(resolution=16, ch=32, ch_mult=(1, 2),
                         num_res_blocks=1, z_channels=64, embed_dim=64,
                         n_embed=1024, attn_resolutions=())
    vae = VQGanVAE(image_size=16, cfg=vq_cfg)
    clip = ClipStackConfig(width=64, layers=2, heads=2,
                           pipeline_stages=pipeline_stages,
                           pipeline_microbatches=2,
                           seq_parallel=seq_parallel)
    cfg = BertConfig(dim=64, num_text_tokens=100, text_seq_len=8,
                     num_visuals=0, num_targets=2, num_image_tokens=1024,
                     image_fmap_size=8, image_size=16, clip=clip)
    return MMVIDBert(cfg, vae)


@pytest.mark.slow
def test_pp_train_step_matches_dp_only():
    """One train step on dp=2,pp=2,tp=2 equals the dp=8 step (same params,
    same key, same batch) to float tolerance."""
    from mmvid_tpu.parallel.mesh import make_mesh
    from mmvid_tpu.training import (
        TrainConfig,
        create_train_state,
        jit_train_step,
    )

    assert len(jax.devices()) >= 8
    m_ref = _tiny_models(1)
    m_pp = _tiny_models(2, seq_parallel=True)
    m_pp.params = adapt_stack_layout(dict(m_ref.params), 2, pipelined=True)

    tc = TrainConfig(beta_rel=0.5, beta_vid=0.5, total_steps=10,
                     lr_scheduler_warmup=2, dropout_vc=0.0)
    rng = np.random.RandomState(0)
    batch = {'text': jnp.asarray(rng.randint(1, 100, (8, 8)), jnp.int32),
             'target': jnp.asarray(rng.uniform(0, 1, (8, 2, 16, 16, 3)),
                                   jnp.float32)}
    key = jax.random.PRNGKey(0)

    mesh1 = make_mesh('dp=8')
    s1 = jit_train_step(m_ref, tc, mesh=mesh1)
    st1 = s1.shard_state(create_train_state(m_ref, tc))
    _, met1 = s1(st1, batch, key)

    mesh2 = make_mesh('dp=2,pp=2,tp=2')
    s2 = jit_train_step(m_pp, tc, mesh=mesh2)
    st2 = s2.shard_state(create_train_state(m_pp, tc))
    st2, met2 = s2(st2, batch, key)

    assert np.isfinite(float(met2['loss']))
    np.testing.assert_allclose(float(met1['loss']), float(met2['loss']),
                               rtol=1e-5)
    np.testing.assert_allclose(float(met1['grad_norm']),
                               float(met2['grad_norm']), rtol=1e-4)


@pytest.mark.quick
def test_param_shardings_pp_rules():
    """Stacked block kernels shard (pp, -, tp); other stacked leaves pp."""
    from jax.sharding import PartitionSpec as P

    from mmvid_tpu.parallel.mesh import make_mesh, param_shardings

    m = _tiny_models(2)
    mesh = make_mesh('dp=2,pp=2,tp=2')
    sh = param_shardings(m.params, mesh)
    t = sh['transformer']['blocks']
    assert t['attn']['query']['kernel'].spec == P('pp', None, 'tp')
    assert t['attn']['out']['kernel'].spec == P('pp', 'tp', None)
    assert t['mlp']['fc']['kernel'].spec == P('pp', None, 'tp')
    assert t['mlp']['proj']['kernel'].spec == P('pp', 'tp', None)
    assert t['ln_1']['scale'].spec == P('pp')
    # non-block params stay replicated
    assert sh['image_emb']['embedding'].spec == P()


@pytest.mark.quick
def test_adapt_opt_state_layout():
    """Adam moments survive a resume across a pp-topology change: the
    params-shaped subtrees of the optax state convert between per-block and
    stacked layouts with values preserved."""
    from mmvid_tpu.training import (
        TrainConfig,
        adapt_opt_state_layout,
        make_optimizer,
    )

    seq, _ = _stacks(layers=2)
    x = jnp.zeros((1, 8, 64))
    p = {'transformer': seq.init(jax.random.PRNGKey(0), x, None)['params'],
         'emb': jnp.ones((3, 4))}
    tx = make_optimizer(TrainConfig())
    st = tx.init(p)
    st_stacked = adapt_opt_state_layout(st, 2, pipelined=True)
    st_back = adapt_opt_state_layout(st_stacked, 2, pipelined=False)
    for a, b in zip(jax.tree_util.tree_leaves(st),
                    jax.tree_util.tree_leaves(st_back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the stacked state really is stacked
    flat = jax.tree_util.tree_flatten_with_path(st_stacked)[0]
    assert any('blocks' in jax.tree_util.keystr(kp) and
               np.asarray(v).shape[:1] == (2,)
               for kp, v in flat
               if hasattr(v, 'shape') and getattr(v, 'ndim', 0) > 0
               and 'blocks' in jax.tree_util.keystr(kp))


@pytest.mark.quick
def test_dcn_axis_mesh_and_batch_sharding():
    """'dcn' is cross-slice data parallelism: parse, mesh layout, and the
    batch sharded over (dcn, dp) jointly.  On single-slice (CPU-simulated)
    devices the layout degrades to a positional reshape."""
    from mmvid_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        parse_mesh_shape,
    )

    axes = parse_mesh_shape('dcn=2,dp=2,tp=2', 8)
    assert axes == {'dcn': 2, 'dp': 2, 'pp': 1, 'tp': 2}
    with pytest.raises(ValueError):
        parse_mesh_shape('dcn=3,dp=1', 8)

    mesh = make_mesh('dcn=2,dp=4')
    assert dict(mesh.shape) == {'dcn': 2, 'dp': 4, 'pp': 1, 'tp': 1}
    bs = batch_sharding(mesh)
    x = jnp.arange(32.0).reshape(8, 4)
    xs = jax.device_put(x, bs)
    # batch rows spread over all dcn*dp=8 devices
    assert len({d for d in xs.sharding.device_set}) == 8
    y = jax.jit(lambda a: a.sum())(xs)
    assert float(y) == float(x.sum())


@pytest.mark.quick
def test_seq_parallel_matches_baseline():
    """sp sharding constraints change the layout, never the numbers."""
    from mmvid_tpu.parallel.mesh import make_mesh

    seq = TransformerStack(ClipStackConfig(width=64, layers=2, heads=2))
    sp = TransformerStack(ClipStackConfig(width=64, layers=2, heads=2,
                                          seq_parallel=True))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 64))
    p = seq.init(jax.random.PRNGKey(0), x, None)['params']
    y_ref = seq.apply({'params': p}, x, None)
    mesh = make_mesh('dp=2,pp=1,tp=4')
    with mesh:
        y_sp = jax.jit(lambda pp, xx: sp.apply({'params': pp}, xx, None))(
            p, x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_sp),
                               atol=1e-5, rtol=1e-5)
