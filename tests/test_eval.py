"""Evaluation stack: PRD math, Fréchet distance, ping-pong extension, I3D."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.eval.fvd import (
    extend_video_pingpong,
    frechet_distance,
    preprocess_videos,
)
from mmvid_tpu.eval import prd


# ---- PRD (edge cases mirroring the reference's unittest suite) ----

def test_prd_perfect_overlap():
    d = [0.5, 0.5]
    p, r = prd.compute_prd(d, d, num_angles=11)
    assert np.max(p) > 0.99 and np.max(r) > 0.99


def test_prd_no_overlap():
    p, r = prd.compute_prd([1.0, 0.0], [0.0, 1.0], num_angles=11)
    assert np.max(p) < 1e-5 and np.max(r) < 1e-5


def test_prd_asymmetry():
    # eval covers half of ref: high precision achievable, recall capped
    p, r = prd.compute_prd([1.0, 0.0], [0.5, 0.5], num_angles=1001)
    f8, f1_8 = prd.prd_to_max_f_beta_pair(p, r, beta=8)
    # F_8 weighs recall: limited; F_1/8 weighs precision: high
    assert f1_8 > 0.9
    assert f8 < 0.62


def test_prd_validation_errors():
    with pytest.raises(ValueError):
        prd.compute_prd([1.0], [1.0], num_angles=2)
    with pytest.raises(ValueError):
        prd.compute_prd([1.0], [1.0], epsilon=0.5)
    with pytest.raises(ValueError):
        prd.prd_to_max_f_beta_pair(np.array([1.5]), np.array([0.5]))
    with pytest.raises(ValueError):
        prd.prd_to_max_f_beta_pair(np.array([0.5]), np.array([0.5]),
                                   beta=0)


def test_prd_from_embedding_balance():
    rng = np.random.RandomState(0)
    a = rng.randn(64, 4)
    b = rng.randn(63, 4)
    with pytest.raises(ValueError):
        prd.compute_prd_from_embedding(a, b)
    p, r = prd.compute_prd_from_embedding(a, a[::-1].copy(),
                                          num_clusters=5, num_runs=2)
    f8, f1_8 = prd.prd_to_max_f_beta_pair(p, r)
    assert f8 > 0.9 and f1_8 > 0.9  # same distribution


def test_f_beta_math():
    # single point p=r=0.5 -> F_beta = 0.5 for any beta
    f8, f1_8 = prd.prd_to_max_f_beta_pair(np.array([0.5]), np.array([0.5]))
    assert abs(f8 - 0.5) < 1e-9 and abs(f1_8 - 0.5) < 1e-9


# ---- Fréchet distance ----

def test_frechet_identical_is_zero():
    rng = np.random.RandomState(1)
    x = rng.randn(500, 16)
    assert abs(frechet_distance(x, x.copy())) < 1e-6


def test_frechet_matches_analytic_1d():
    rng = np.random.RandomState(2)
    x = rng.randn(20000, 1) * 2.0 + 1.0     # N(1, 4)
    y = rng.randn(20000, 1) * 3.0 - 1.0     # N(-1, 9)
    d = frechet_distance(x, y)
    s1, s2 = x.var(ddof=1), y.var(ddof=1)
    expected = (x.mean() - y.mean()) ** 2 + s1 + s2 - 2 * np.sqrt(s1 * s2)
    np.testing.assert_allclose(d, expected, rtol=1e-6)


def test_frechet_shift_sensitivity():
    rng = np.random.RandomState(3)
    x = rng.randn(1000, 8)
    y = x + 2.0
    d = frechet_distance(x, y)
    np.testing.assert_allclose(d, 4.0 * 8, rtol=0.05)


# ---- video preprocessing ----

def test_extend_video_pingpong():
    v = np.arange(8)[:, None]
    out = extend_video_pingpong(v, 15)
    # [v, flip(v)[1:]] exactly like reference extend_video(video, 2)
    np.testing.assert_array_equal(
        out[:, 0], [0, 1, 2, 3, 4, 5, 6, 7, 6, 5, 4, 3, 2, 1, 0])
    out22 = extend_video_pingpong(np.arange(16)[:, None], 16)
    np.testing.assert_array_equal(out22[:, 0], np.arange(16))


def test_preprocess_videos():
    v = jnp.ones((1, 2, 64, 64, 3)) * 0.5
    out = preprocess_videos(v)
    assert out.shape == (1, 2, 224, 224, 3)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


# ---- I3D ----

def test_i3d_shapes_and_converter():
    from mmvid_tpu.eval.i3d import I3D, convert_tfhub_i3d

    model = I3D()
    x = jnp.zeros((1, 15, 224, 224, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 400)

    # converter produces the exact same tree structure as flax init
    var_dict = {}

    def collect(tree, prefix, into, leaf_map):
        for k, v in tree.items():
            if isinstance(v, dict):
                collect(v, prefix + [k], into, leaf_map)
            else:
                into['/'.join(prefix + [k])] = np.asarray(v)

    flat = {}
    collect(variables['params'], [], flat, None)
    statflat = {}
    collect(variables['batch_stats'], [], statflat, None)

    # synthesize a TF-style var dict from the flax tree names
    inv_leaf = {'kernel': 'w', 'bias': 'b'}
    for name, w in flat.items():
        parts = name.split('/')
        if parts[0].startswith('Mixed'):
            mod, unit = parts[0], parts[1]
            branch, conv = unit.split('_', 1)
            branch = f'{branch}_{conv.split("_")[0]}'
            # e.g. Branch_0_Conv3d_0a_1x1 -> Branch_0 / Conv3d_0a_1x1
            b, rest = parts[1].split('_Conv3d_')
            tf_name = f'RGB/inception_i3d/{mod}/{b}/Conv3d_{rest}'
            tail = parts[2:]
        elif parts[0].startswith('Logits'):
            tf_name = ('RGB/inception_i3d/Logits/'
                       + parts[0][len('Logits_'):])
            tail = parts[1:]
        else:
            tf_name = f'RGB/inception_i3d/{parts[0]}'
            tail = parts[1:]
        if tail[0] == 'conv_3d':
            var_dict[f'{tf_name}/conv_3d/{inv_leaf[tail[1]]}'] = w
        else:  # batch_norm bias == beta
            var_dict[f'{tf_name}/batch_norm/beta'] = w
    for name, w in statflat.items():
        parts = name.split('/')
        if parts[0].startswith('Mixed'):
            mod = parts[0]
            b, rest = parts[1].split('_Conv3d_')
            tf_name = f'RGB/inception_i3d/{mod}/{b}/Conv3d_{rest}'
        else:
            tf_name = f'RGB/inception_i3d/{parts[0]}'
        leaf = {'mean': 'moving_mean', 'var': 'moving_variance'}[parts[-1]]
        var_dict[f'{tf_name}/batch_norm/{leaf}'] = w

    converted = convert_tfhub_i3d(var_dict)
    # identical structure + values -> identical output
    out2 = model.apply({'params': converted['params'],
                        'batch_stats': converted['batch_stats']}, x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-6)


def test_pingpong_indices_edge_cases():
    """t=1 must repeat frame 0 (regression: the direction walk ran to
    negative indices, which jnp gather would consume silently); t >=
    target truncates."""
    from mmvid_tpu.eval.fvd import pingpong_indices

    np.testing.assert_array_equal(pingpong_indices(1, 5), [0] * 5)
    np.testing.assert_array_equal(pingpong_indices(4, 8),
                                  [0, 1, 2, 3, 2, 1, 0, 1])
    np.testing.assert_array_equal(pingpong_indices(16, 16), np.arange(16))
    assert (pingpong_indices(8, 15) >= 0).all()
    # consistency with the host-side helper
    v = np.arange(8)[:, None]
    np.testing.assert_array_equal(
        extend_video_pingpong(v, 15)[:, 0],
        v[pingpong_indices(8, 15), 0])
