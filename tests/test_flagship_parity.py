"""Flagship-LAYOUT mask-predict parity vs the torch oracle (VERDICT r3 #3).

The round-3 parity suite pins sampler semantics at a tiny layout (1 frame
of 2x2 tokens).  Layout arithmetic — the axial grid at 8x8, multi-frame
preserve index maps, face-erase regions, the 565-token control+target
sequence — is exactly where a silent transposition would hide, so these
tests re-run the deterministic step-for-step trajectory parity at the
FLAGSHIP layout: 8 frames x 8x8 tokens (512-target, 565-token sequence),
real vocab 1024, the production DEFAULT_MP_CONFIG schedule (T=20), plus a
long-mode multi-frame preserve variant and face-erase control variants.

Model WIDTH is kept small (64-dim, 2 layers): every index computation the
tests guard — rearranges, preserve masks, erase regions, axial position
tables, keep-count arithmetic over 512 positions — depends only on the
layout, not on the channel count, and the narrow stack keeps the oracle's
21 full-sequence forwards affordable on the 1-core CPU host.

Reference: /root/reference/mmvid_pytorch/dalle_bert.py:514-714 (sampler),
:543-583 (preserve/long chunking), :796-848 (erase_codebook_face),
:880-990 (control assembly at this layout).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.bert import BertConfig, BertCore
from mmvid_tpu.models.clip import ClipStackConfig
from mmvid_tpu.models.masking import erase_codebook_face
from mmvid_tpu.models.mmvid import DEFAULT_MP_CONFIG
from mmvid_tpu.models.sampler import (
    arrange_preserve_tokens,
    build_spec,
    mask_predict,
    mask_predict_trace,
    preserve_layout,
)
from mmvid_tpu.utils.torch_compat import convert_bert

from oracles import load_reference_bert
from test_sampler_parity import _patch_deterministic, _run_ref_recorded

pytestmark = pytest.mark.slow

DIM, LAYERS, HEADS = 64, 2, 2
TEXT_LEN, N_TEXT = 50, 100
VOCAB = 1024
FRAMES, FMAP = 8, 8                       # 8 frames x 8x8 tokens = 512
MP = dict(DEFAULT_MP_CONFIG)              # production schedule, T=20


def _pair(num_visuals, seed):
    ref = load_reference_bert(dim=DIM, heads=HEADS, layers=LAYERS,
                              text_seq_len=TEXT_LEN, num_text_tokens=N_TEXT,
                              num_visuals=num_visuals, num_targets=FRAMES,
                              image_size=32, vae_layers=2, num_tokens=VOCAB,
                              seed=seed)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_bert(sd)['params']
    cfg = BertConfig(dim=DIM, num_text_tokens=N_TEXT, text_seq_len=TEXT_LEN,
                     num_visuals=num_visuals, num_targets=FRAMES,
                     num_image_tokens=VOCAB, image_fmap_size=FMAP,
                     image_size=32,
                     clip=ClipStackConfig(width=DIM, layers=LAYERS,
                                          heads=HEADS))
    return ref, params, cfg


def _controls(ref, params, cfg, seed, visual_np=None, **ref_kwargs):
    """Shared inputs -> (torch ctrl, jax ctrl, core); asserts control
    parity first so a trajectory failure isolates the SAMPLER."""
    import torch
    rng = np.random.RandomState(seed)
    text = rng.randint(1, N_TEXT, size=(1, TEXT_LEN))
    t_kwargs = {}
    if visual_np is not None:
        t_kwargs['visual'] = torch.from_numpy(visual_np).long()
    with torch.no_grad():
        ctrl_ref = ref(torch.from_numpy(text).long(), return_loss=False,
                       **t_kwargs, **ref_kwargs)
    core = BertCore(cfg)
    return text, ctrl_ref, core


def test_flagship_deterministic_trajectory_parity():
    """8 frames x 8x8, 565-token sequence, T=20 production schedule:
    step-for-step identical trajectories under the common deterministic
    rule (dalle_bert.py:514-714 at the shipped layout)."""
    mp = pytest.MonkeyPatch()
    try:
        ref, params, cfg = _pair(num_visuals=0, seed=61)
        text, ctrl_ref, core = _controls(ref, params, cfg, seed=67)
        ctrl = core.apply({'params': params}, jnp.asarray(text), None,
                          method=BertCore.control_embedding)
        np.testing.assert_allclose(np.asarray(ctrl), ctrl_ref.numpy(),
                                   rtol=1e-4, atol=1e-5)
        # the flagship sequence: [REL]+50 text+[ST1][VID] + 512 targets
        assert ctrl.shape[1] + cfg.target_seq_len == 565

        _patch_deterministic(mp)
        final_ref, traj_ref = _run_ref_recorded(ref, ctrl_ref,
                                                dynamic=False,
                                                steps=MP['T'], mp=MP)
        pmask, N = preserve_layout(cfg, 'long', 1, False)
        spec = dataclasses.replace(
            build_spec(MP, N, steps=MP['T'], dynamic=False),
            deterministic=True)
        toks_per_step, _, final = mask_predict_trace(
            core, params, ctrl, jax.random.PRNGKey(0), spec, pmask)
        toks_per_step = np.asarray(toks_per_step)

        assert len(traj_ref) == MP['T'] - 1
        for t, ref_state in enumerate(traj_ref):
            np.testing.assert_array_equal(
                toks_per_step[t], ref_state,
                err_msg=f'flagship trajectory diverged at post-step {t}')
        np.testing.assert_array_equal(np.asarray(final), final_ref)
    finally:
        mp.undo()


def test_flagship_preserve_long_parity():
    """Long-mode multi-frame preserve at the flagship layout: the first
    t_overlap=2 frames carry the previous chunk's LAST 2 frames frozen
    through all 20 rounds (dalle_bert.py:543-583 index arithmetic over
    the 8-frame 8x8 grid)."""
    import torch
    mp = pytest.MonkeyPatch()
    try:
        ref, params, cfg = _pair(num_visuals=0, seed=71)
        text, ctrl_ref, core = _controls(ref, params, cfg, seed=73)
        ctrl = core.apply({'params': params}, jnp.asarray(text), None,
                          method=BertCore.control_embedding)

        rng = np.random.RandomState(79)
        prev = rng.randint(0, VOCAB, size=(1, cfg.target_seq_len))
        prev_ref = torch.from_numpy(
            prev.reshape(cfg.num_targets, cfg.image_seq_len)).long()

        _patch_deterministic(mp)
        with torch.no_grad():
            final_ref, _ = ref.mask_predict(
                ctrl_ref, dynamic=False, steps=MP['T'], mp_config=dict(MP),
                preserve=prev_ref, t_overlap=2, long_mode='long')
        final_ref = final_ref.numpy()
        # preserved slots = the previous chunk's last 2 frames
        np.testing.assert_array_equal(
            final_ref[:, :2 * cfg.image_seq_len],
            prev[:, -2 * cfg.image_seq_len:])

        pmask, N = preserve_layout(cfg, 'long', 2, True)
        spec = dataclasses.replace(
            build_spec(MP, N, steps=MP['T'], dynamic=False),
            deterministic=True)
        ptoks = arrange_preserve_tokens(cfg, jnp.asarray(prev), 'long', 2)
        final = mask_predict(core, params, ctrl, jax.random.PRNGKey(0),
                             spec, np.asarray(pmask), ptoks)
        np.testing.assert_array_equal(np.asarray(final), final_ref)
    finally:
        mp.undo()


def test_flagship_beam_dynamic_stop_parity():
    """Beams=2 + dynamic=True at the flagship layout (VERDICT r4 weak #4):
    the per-round beam chaining (beam j's Y/I update composes on beam
    j-1's, dalle_bert.py:675-693), the S = ½σ(REL)+½σ(VID) best-beam
    selection, and the 5-round-patience dynamic stop returning Imax (the
    best-scoring state, NOT the last) must all match the oracle over the
    512-token target.  Under the deterministic rule both beams draw the
    same re-mask pattern, so this pins the chaining/selection/stop
    BOOKKEEPING at flagship shape; beam divergence itself is pinned by
    the toy-layout distribution tests (test_sampler_parity.py)."""
    mp_patch = pytest.MonkeyPatch()
    try:
        ref, params, cfg = _pair(num_visuals=0, seed=101)
        text, ctrl_ref, core = _controls(ref, params, cfg, seed=103)
        ctrl = core.apply({'params': params}, jnp.asarray(text), None,
                          method=BertCore.control_embedding)
        np.testing.assert_allclose(np.asarray(ctrl), ctrl_ref.numpy(),
                                   rtol=1e-4, atol=1e-5)

        _patch_deterministic(mp_patch)
        mp = dict(MP, B=2)
        final_ref, _ = _run_ref_recorded(ref, ctrl_ref, dynamic=True,
                                         steps=MP['T'], mp=mp)
        pmask, N = preserve_layout(cfg, 'long', 1, False)
        spec = dataclasses.replace(
            build_spec(mp, N, steps=MP['T'], dynamic=True),
            deterministic=True)
        assert spec.beams == 2 and spec.dynamic
        final = mask_predict(core, params, ctrl, jax.random.PRNGKey(0),
                             spec, pmask)
        np.testing.assert_array_equal(np.asarray(final), final_ref)
    finally:
        mp_patch.undo()


@pytest.mark.parametrize('face_mode', ['eyes_nose', 'mouth'])
def test_flagship_face_erase_parity(face_mode):
    """Face-erase visual control at the flagship layout: the erased
    8x8-grid control tokens match the reference region-for-region
    (dalle_bert.py:796-848) and the deterministic trajectory conditioned
    on them matches end to end."""
    import torch
    mp = pytest.MonkeyPatch()
    try:
        ref, params, cfg = _pair(num_visuals=1, seed=83)
        rng = np.random.RandomState(89)
        visual = rng.randint(0, VOCAB, size=(1, cfg.visual_seq_len))

        # erase parity first (the reference applies it inside forward;
        # 2-D token inputs pass get_image_tokens untouched)
        with torch.no_grad():
            erased_ref = ref.erase_codebook_face(
                torch.from_numpy(visual).long(), 'face_8x8',
                face_mode).numpy()
        erased = np.asarray(erase_codebook_face(
            jax.random.PRNGKey(0), jnp.asarray(visual), cfg, 'face_8x8',
            face_mode=face_mode))
        np.testing.assert_array_equal(erased, erased_ref)

        text, ctrl_ref, core = _controls(ref, params, cfg, seed=97,
                                         visual_np=visual,
                                         vc_mode='face_8x8',
                                         face_mode=face_mode)
        ctrl = core.apply({'params': params}, jnp.asarray(text),
                          jnp.asarray(erased),
                          method=BertCore.control_embedding)
        np.testing.assert_allclose(np.asarray(ctrl), ctrl_ref.numpy(),
                                   rtol=1e-4, atol=1e-5)

        _patch_deterministic(mp)
        final_ref, _ = _run_ref_recorded(ref, ctrl_ref, dynamic=False,
                                         steps=MP['T'], mp=MP)
        pmask, N = preserve_layout(cfg, 'long', 1, False)
        spec = dataclasses.replace(
            build_spec(MP, N, steps=MP['T'], dynamic=False),
            deterministic=True)
        final = mask_predict(core, params, ctrl, jax.random.PRNGKey(0),
                             spec, pmask)
        np.testing.assert_array_equal(np.asarray(final), final_ref)
    finally:
        mp.undo()
