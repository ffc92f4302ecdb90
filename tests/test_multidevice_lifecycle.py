"""Multi-topology lifecycle certification (VERDICT r3 #6).

The driver's dryrun certifies ONE shape (8 devices, dp=2,pp=2,tp=2).
These tests run the SAME lifecycle helper (__graft_entry__.run_lifecycle:
train step -> pp-layout->sequential restore -> dp x tp generation -> eval
embed) at other topologies so no 8-device special-casing can hide, plus a
two-virtual-slice hybrid mesh construction test for the dcn axis
(parallel/mesh.py::make_mesh's create_hybrid_device_mesh branch).

Parallelism is an explicit, tested module (SURVEY §2.3); reference scale
model: torch.distributed DDP in /root/reference/train.py.
"""

import numpy as np
import pytest

import jax

from __graft_entry__ import run_lifecycle

pytestmark = pytest.mark.slow


def test_lifecycle_4dev_dp2_tp2():
    """4-device dp=2,tp=2: Megatron-TP backbone without the pipeline."""
    devices = jax.devices()[:4]
    out = run_lifecycle(devices, dp=2, pp=1, tp=2)
    assert np.isfinite(out['loss'])
    assert out['tp_used'], 'tp=2 must shard the backbone projections'
    assert out['n_video_devices'] == 4
    assert (out['seq'] >= 0).all()


def test_lifecycle_8dev_dp8():
    """Pure data parallelism: dp=8, no tp/pp — the common serving shape."""
    devices = jax.devices()[:8]
    out = run_lifecycle(devices, dp=8, pp=1, tp=1)
    assert np.isfinite(out['loss'])
    assert not out['tp_used']
    assert out['n_video_devices'] == 8


def test_lifecycle_8dev_dp2_pp2_tp2():
    """The driver-certified shape also runs inside the suite, so a
    regression shows up in CI before the driver flags it."""
    devices = jax.devices()[:8]
    out = run_lifecycle(devices, dp=2, pp=2, tp=2)
    assert np.isfinite(out['loss'])
    assert out['tp_used']


class _SliceProxy:
    """CPU device tagged with a fake slice_index so make_mesh's
    multi-slice (DCN) branch is reachable without multi-slice hardware."""

    def __init__(self, device, slice_index):
        self._device = device
        self.slice_index = slice_index

    def __getattr__(self, name):
        return getattr(self._device, name)

    def __repr__(self):
        return f'SliceProxy({self._device.id}, slice={self.slice_index})'


def test_hybrid_dcn_mesh_layout():
    """dcn=2 over two virtual slices routes through
    mesh_utils.create_hybrid_device_mesh: slice_index must vary ONLY
    along the dcn axis (every ICI axis stays inside one slice)."""
    from mmvid_tpu.parallel.mesh import batch_sharding, make_mesh

    devices = jax.devices()[:8]
    proxies = [_SliceProxy(d, i // 4) for i, d in enumerate(devices)]
    mesh = make_mesh('dcn=2,dp=2,tp=2', devices=proxies)
    assert dict(mesh.shape) == {'dcn': 2, 'dp': 2, 'pp': 1, 'tp': 2}

    si = np.vectorize(lambda d: d.slice_index)(mesh.devices)
    # axis order is (dcn, dp, pp, tp): constant within each dcn slice
    assert (si[0] == 0).all() and (si[1] == 1).all(), si
    # batch rows spread over (dcn, dp) jointly
    spec = batch_sharding(mesh).spec
    assert spec[0] == ('dcn', 'dp')


def test_hybrid_dcn_mesh_mismatched_slices_raises():
    """3 granules cannot satisfy dcn=2 — the layout must fail loudly
    rather than silently interleave slices across ICI axes."""
    from mmvid_tpu.parallel.mesh import make_mesh

    devices = jax.devices()[:8]
    # 3 uneven slices: sizes 3/3/2
    proxies = [_SliceProxy(d, min(i // 3, 2)) for i, d in
               enumerate(devices)]
    with pytest.raises(ValueError):
        make_mesh('dcn=2,dp=4', devices=proxies)
