"""Test bootstrap: force an 8-device virtual CPU platform BEFORE jax imports.

Multi-device sharding tests run on the host CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) as the reference's DDP is
only exercisable on real hardware; here every sharding path compiles and runs
in CI. (SURVEY.md §4 implication.)
"""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'  # force: the ambient env may set a TPU
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

# The environment may install a TPU platform plugin (sitecustomize) that
# re-forces JAX_PLATFORMS after env setup; pin the config explicitly too.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert jax.devices()[0].platform == 'cpu'

# Make the repo root importable regardless of pytest rootdir config.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def rng():
    import jax
    return jax.random.PRNGKey(0)
