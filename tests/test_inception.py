"""InceptionV3 embedder: shapes, channel plan, converter roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.eval.inception import (
    InceptionV3,
    convert_slim_inception,
    inception_preprocess,
)


@pytest.fixture(scope='module')
def model_and_vars():
    model = InceptionV3()
    x = jnp.zeros((1, 299, 299, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_pool3_shape(model_and_vars):
    model, variables = model_and_vars
    out = model.apply(variables, jnp.zeros((2, 299, 299, 3)))
    assert out.shape == (2, 2048)  # the classic pool_3 width


def test_channel_plan(model_and_vars):
    _, variables = model_and_vars
    p = variables['params']
    # stem widths
    assert p['Conv2d_1a_3x3']['conv']['kernel'].shape == (3, 3, 3, 32)
    assert p['Conv2d_4a_3x3']['conv']['kernel'].shape == (3, 3, 80, 192)
    # Mixed_5b sees 192 in, outputs 64+64+96+32 = 256
    assert p['Mixed_5b']['Branch_0_Conv2d_0a_1x1']['conv'][
        'kernel'].shape[2] == 192
    # Mixed_6a input = 288 (Mixed_5d out: 64+64+96+64)
    assert p['Mixed_6a']['Branch_0_Conv2d_1a_1x1']['conv'][
        'kernel'].shape[2] == 288
    # Mixed_7a input = 768; Mixed_7b input = 320+192+768 = 1280
    assert p['Mixed_7a']['Branch_0_Conv2d_0a_1x1']['conv'][
        'kernel'].shape[2] == 768
    assert p['Mixed_7b']['Branch_0_Conv2d_0a_1x1']['conv'][
        'kernel'].shape[2] == 1280


def test_slim_converter_roundtrip(model_and_vars):
    model, variables = model_and_vars

    # synthesize a slim-style var dict from the flax tree, convert back,
    # and require identical outputs
    var_dict = {}

    def walk(tree, prefix, kind):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + [k], kind)
            else:
                parts = list(prefix) + [k]
                if parts[0].startswith('Mixed'):
                    mod, unit = parts[0], parts[1]
                    branch, conv = unit.split('_Conv2d_')
                    base = f'InceptionV3/{mod}/{branch}/Conv2d_{conv}'
                    tail = parts[2:]
                else:
                    base = f'InceptionV3/{parts[0]}'
                    tail = parts[1:]
                if tail[0] == 'conv':
                    var_dict[f'{base}/weights'] = np.asarray(v)
                else:
                    leaf = {'bias': 'beta', 'mean': 'moving_mean',
                            'var': 'moving_variance'}[tail[1]]
                    var_dict[f'{base}/BatchNorm/{leaf}'] = np.asarray(v)

    walk(variables['params'], [], 'params')
    walk(variables['batch_stats'], [], 'stats')
    converted = convert_slim_inception(var_dict)

    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 299, 299, 3)) * 2 - 1
    a = model.apply(variables, x)
    b = model.apply({'params': converted['params'],
                     'batch_stats': converted['batch_stats']}, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_preprocess_range():
    x = jnp.full((1, 64, 64, 3), 0.5)
    out = inception_preprocess(x)
    assert out.shape == (1, 299, 299, 3)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
