"""Top-level MMVID model: the reference ``BERT`` class's public API
(mmvid_pytorch/dalle_bert.py:259-487) over the TPU-native pieces.

Holds the frozen VQGAN tokenizers (vae for targets, optional cvae for visual
controls, dalle_bert.py:387-390), the BertCore transformer, and wires
training losses (masking/warps via explicit keys) and batched mask-predict
generation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmvid_tpu.models.bert import BertConfig, BertCore, bert_losses
from mmvid_tpu.models.masking import (
    erase_codebook_face,
    random_erase_codebook,
    sample_msm_mask,
)
from mmvid_tpu.models.sampler import (
    arrange_preserve_tokens,
    build_spec,
    mask_predict,
    mask_predict_trace,
    preserve_layout,
)
from mmvid_tpu.models.vqgan import VQGanVAE
from mmvid_tpu.models.warp import (
    apply_warp_token_plan,
    warp,
    warp_token_plan,
    warp_video_with_color,
)


class MMVIDBert:
    """Functional wrapper: params live in ``self.params`` (a pytree), every
    method is pure given (params, key) and jit-cached per static flags."""

    def __init__(self, cfg: BertConfig, vae: VQGanVAE,
                 cvae: Optional[VQGanVAE] = None, params=None,
                 key=None, dtype=jnp.float32):
        if cvae is not None:
            cfg = dataclasses.replace(cfg, use_separate_visual_emb=True)
        self.cfg = cfg
        self.vae = vae
        self.cvae = cvae
        self.core = BertCore(cfg, dtype=dtype)
        if params is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            params = self.init_params(key)
        self.params = params
        self._gen_cache: Dict[Any, Any] = {}

    def init_params(self, key):
        cfg = self.cfg
        text = (jnp.zeros((1, cfg.text_seq_len), jnp.int32)
                if cfg.fixed_language_model is None
                else jnp.zeros((1, cfg.text_feature_dim)))
        visual = (jnp.zeros((1, cfg.visual_seq_len), jnp.int32)
                  if cfg.num_visuals > 0 else None)
        target = jnp.zeros((1, cfg.target_seq_len), jnp.int32)
        return self.core.init(key, text, visual, target)['params']

    # ------------------------------------------------------------------
    # Tokenization (dalle_bert.py:716-751)
    # ------------------------------------------------------------------
    def get_image_tokens(self, images, which_vae='vae', insert_sep=False):
        """images [B,T,H,W,3] in [0,1] (or [B,H,W,3]) -> [B, T*n(+T)] ids."""
        vae = self.cvae if (which_vae == 'cvae' and self.cvae is not None) \
            else self.vae
        if images.ndim == 4:
            images = images[:, None]
        b, t = images.shape[:2]
        flat = images.reshape((b * t,) + images.shape[2:])
        toks = vae.get_codebook_indices(flat).reshape(b, t, -1)
        if insert_sep:
            sep = jnp.full((b, t, 1), self.cfg.sep_token, toks.dtype)
            toks = jnp.concatenate([toks, sep], axis=2)
        return toks.reshape(b, -1)

    def prepare_visual_tokens(self, key, visual, *, erase_visual=False,
                              erase_visual_half=False, vc_mode=None,
                              face_mode=None, visual_aug_mode=None):
        """Visual-control pipeline (dalle_bert.py:938-965): optional
        motion-color aug, tokenize through cvae, random/structured erase."""
        cfg = self.cfg
        if visual is None:
            b = 1
            return None
        if visual.ndim >= 4 and visual.dtype in (jnp.float32, jnp.bfloat16,
                                                 jnp.float16):
            if visual_aug_mode == 'motion_color':
                k1, k2, key = jax.random.split(key, 3)
                do = jax.random.uniform(k1) < 0.9
                shifted = visual.at[:, 1:].set(
                    warp_video_with_color(k2, visual[:, 1:]))
                visual = jnp.where(do, shifted, visual)
            tokens = self.get_image_tokens(visual, which_vae='cvae',
                                           insert_sep=cfg.insert_sep)
        else:
            tokens = visual  # already token ids
        if cfg.insert_sep:
            if erase_visual or vc_mode is not None:
                raise NotImplementedError(
                    'erase/vc_mode with insert_sep not supported yet')
            return tokens
        if erase_visual:
            key, k = jax.random.split(key)
            tokens = random_erase_codebook(k, tokens, cfg,
                                           erase_half=erase_visual_half)
        if vc_mode is not None:
            key, k = jax.random.split(key)
            tokens = erase_codebook_face(k, tokens, cfg, vc_mode, face_mode)
        return tokens

    def fully_masked_visual(self, batch: int):
        return jnp.full((batch, self.cfg.visual_seq_len),
                        self.cfg.mask_token, jnp.int32)

    # ------------------------------------------------------------------
    # Training loss (dalle_bert.py:869-1127)
    # ------------------------------------------------------------------
    def loss(self, params, key, *, text, visual=None, target=None,
             rel=False, vid=False, msm_strategy_prob=(0.7, 0.1, 0.1, 0.1),
             msm_bernoulli_prob=(0.2, 0.5), rel_no_fully_masked=False,
             vid_strategy_prob=(0.25, 0.25, 0.25, 0.25), pc_prob=0.0,
             erase_visual=False, erase_visual_half=False, vc_mode=None,
             face_mode=None, visual_aug_mode=None, negvc=False,
             visual_neg=None, text_neg=None, visual_drop=None):
        """Returns (loss_msm, loss_rel, loss_vid).  target: frames
        [B,T,H,W,3] in [0,1] or pre-tokenized [B, target_seq_len].

        visual_drop: optional traced scalar bool — when True the visual
        control is replaced by a fully-[MASK] row, the jit-safe equivalent
        of the reference's visual=None dropout_vc path (train.py:300-302,
        dalle_bert.py:954-958)."""
        cfg = self.cfg
        k_vis, k_mask, k_warp = jax.random.split(key, 3)

        b = text.shape[0]
        if cfg.num_visuals > 0:
            if visual is not None:
                visual_tokens = self.prepare_visual_tokens(
                    k_vis, visual, erase_visual=erase_visual,
                    erase_visual_half=erase_visual_half, vc_mode=vc_mode,
                    face_mode=face_mode, visual_aug_mode=visual_aug_mode)
                if visual_drop is not None:
                    visual_tokens = jnp.where(
                        visual_drop, self.fully_masked_visual(b),
                        visual_tokens)
            else:
                visual_tokens = self.fully_masked_visual(b)
        else:
            visual_tokens = None

        if target.ndim >= 4:
            target_tokens = self.get_image_tokens(target)
            target_frames = target
        else:
            target_tokens = target
            target_frames = None

        keep, nfm = sample_msm_mask(
            k_mask, cfg, msm_strategy_prob, msm_bernoulli_prob, pc_prob,
            batch=b)

        target_tokens_warp = None
        if vid and cfg.num_targets > 1 and target_frames is not None:
            import os as _os
            if _os.environ.get('MMVID_TOKEN_WARP', '1') == '1':
                # Token-level warp (bitwise ≡ get_image_tokens(warp(...)),
                # tests/test_warp.py): strategies 0/1 permute the already-
                # encoded target tokens; 2/3 modify ONE frame — so the VID
                # branch re-encodes B frames per step instead of B*T
                # (ROADMAP round 3 for the measured effect; flag read at
                # trace time, A/B via MMVID_TOKEN_WARP=0).
                mod_frame, plan = warp_token_plan(k_warp, target_frames,
                                                  vid_strategy_prob)
                mod_tokens = self.get_image_tokens(mod_frame[:, None])
                target_tokens_warp = apply_warp_token_plan(
                    target_tokens, mod_tokens, plan)
            else:
                warped = warp(k_warp, target_frames, vid_strategy_prob)
                target_tokens_warp = self.get_image_tokens(warped)

        control_neg = None
        if negvc and text_neg is not None:
            # Reference layout: the negative control DROPS the visual
            # segment entirely ([REL]+text_neg+[ST1][VID], shorter sequence
            # with the attn mask sliced [:L,:L]; dalle_bert.py:909-975).
            # visual_neg is accepted for loader parity but unused, exactly
            # like the reference's dead parameter (dalle_bert.py:885,
            # train.py:313).
            del visual_neg
            control_neg = text_neg

        return bert_losses(
            self.core, params, text=text, visual_tokens=visual_tokens,
            target_tokens=target_tokens,
            target_tokens_warp=target_tokens_warp, keep_gt_mask=keep,
            not_fully_masked=nfm, rel=rel, vid=vid,
            rel_no_fully_masked=rel_no_fully_masked,
            control_neg=control_neg)

    # ------------------------------------------------------------------
    # Generation (dalle_bert.py:434-487)
    # ------------------------------------------------------------------
    def generate_images(self, key, text, *, visual=None, erase_visual=False,
                        vc_mode=None, face_mode=None,
                        mask_predict_steps=0, preserve=None, t_overlap=1,
                        long_mode='long', dynamic=True, mp_config=None,
                        decode=True):
        """Returns (videos [B,T,H,W,3] in [0,1], img_seq [B, T*n]).

        The ENTIRE pipeline (visual-control tokenization/corruption, control
        embedding, the full mask-predict loop, and the VQGAN video decode)
        compiles into one XLA program, cached per static configuration — the
        reference dispatches every one of its ~20xB transformer calls and
        per-frame decodes separately (dalle_bert.py:618-714)."""
        cfg = self.cfg
        mp_config = mp_config or DEFAULT_MP_CONFIG

        pmask, N = preserve_layout(cfg, long_mode, t_overlap,
                                   preserve is not None)
        spec = build_spec(mp_config, N, steps=mask_predict_steps,
                          dynamic=dynamic)
        import os as _os
        # env perf flags are read at TRACE time (clip.py / sampler.py /
        # ops/attention.py), so they must key the trace cache — otherwise
        # toggling one on a live model silently reuses the stale trace
        env_flags = tuple(
            _os.environ.get(k, '') for k in
            ('MMVID_PALLAS_ATTN', 'MMVID_PALLAS_SAMPLER', 'MMVID_FAST_LN',
             'MMVID_FUSED_LNQKV', 'MMVID_ATTN_BF16', 'MMVID_ATTN_HPB',
             'MMVID_ATTN_QB', 'MMVID_ATTN_INT8'))
        statics = (spec, pmask.tobytes(), visual is not None,
                   visual.ndim if visual is not None else 0,
                   preserve is not None, erase_visual, vc_mode, face_mode,
                   long_mode, t_overlap, decode, env_flags)
        if statics not in self._gen_cache:
            def impl(params, vae_params, text, visual, key, preserve):
                k_vis, k_sample = jax.random.split(key)
                b = text.shape[0]
                if cfg.num_visuals > 0:
                    if visual is not None:
                        visual_tokens = self.prepare_visual_tokens(
                            k_vis, visual, erase_visual=erase_visual,
                            erase_visual_half=True,  # dalle_bert.py:462-463
                            vc_mode=vc_mode, face_mode=face_mode)
                    else:
                        visual_tokens = self.fully_masked_visual(b)
                else:
                    visual_tokens = None
                control_emb = self.core.apply(
                    {'params': params}, text, visual_tokens,
                    method=BertCore.control_embedding)
                ptoks = None
                if preserve is not None:
                    ptoks = arrange_preserve_tokens(cfg, preserve, long_mode,
                                                    t_overlap)
                img_seq = mask_predict(self.core, params, control_emb,
                                       k_sample, spec, pmask, ptoks)
                if not decode:
                    return None, img_seq
                frames = img_seq.reshape(b * cfg.num_targets,
                                         cfg.image_seq_len)
                imgs = self.vae._decode_impl(vae_params, frames)
                videos = imgs.reshape((b, cfg.num_targets) + imgs.shape[1:])
                return videos, img_seq

            self._gen_cache[statics] = jax.jit(impl)
        return self._gen_cache[statics](self.params, self.vae.params, text,
                                        visual, key, preserve)

    def generate_images_debug(self, key, text, *, visual=None,
                              erase_visual=False, vc_mode=None,
                              face_mode=None, mask_predict_steps=0,
                              mp_config=None):
        """PNAG debug sampling (reference debug=True path,
        dalle_bert.py:635-700): runs the fixed-length trace sampler and
        returns (videos [B,T,H,W,3], img_seq, step_decodes [S,B,T,H,W,3],
        step_keeps [S,B,target_seq_len] bool) — one decoded video + keep
        mask per mask-predict step for the debug grid."""
        cfg = self.cfg
        mp_config = mp_config or DEFAULT_MP_CONFIG
        pmask, N = preserve_layout(cfg, 'long', 1, False)
        spec = build_spec(mp_config, N, steps=mask_predict_steps,
                          dynamic=False)
        k_vis, k_sample = jax.random.split(key)
        b = text.shape[0]
        if cfg.num_visuals > 0:
            if visual is not None:
                visual_tokens = self.prepare_visual_tokens(
                    k_vis, visual, erase_visual=erase_visual,
                    erase_visual_half=True, vc_mode=vc_mode,
                    face_mode=face_mode)
            else:
                visual_tokens = self.fully_masked_visual(b)
        else:
            visual_tokens = None
        control_emb = self.core.apply(
            {'params': self.params}, text, visual_tokens,
            method=BertCore.control_embedding)
        trace, keeps, final = mask_predict_trace(
            self.core, self.params, control_emb, k_sample, spec, pmask)
        steps = trace.shape[0]
        flat = trace.reshape(steps * b * cfg.num_targets, cfg.image_seq_len)
        imgs = self.vae.decode(flat)
        step_decodes = np.asarray(imgs).reshape(
            (steps, b, cfg.num_targets) + imgs.shape[1:])
        videos = step_decodes[-1]
        return videos, final, step_decodes, np.asarray(keeps)

    def decode_video(self, img_seq):
        cfg = self.cfg
        b = img_seq.shape[0]
        frames = img_seq.reshape(b * cfg.num_targets, cfg.image_seq_len)
        imgs = self.vae.decode(frames)
        return imgs.reshape((b, cfg.num_targets) + imgs.shape[1:])

    def recon_images(self, images, which_vae='vae'):
        """Tokenize + decode (round-trip) for visualization
        (dalle_bert.py:753-763).  Handles any frame count (visual controls
        have num_visuals frames, not num_targets)."""
        toks = self.get_image_tokens(images, which_vae=which_vae)
        vae = self.cvae if (which_vae == 'cvae' and self.cvae is not None) \
            else self.vae
        b = toks.shape[0]
        t = toks.shape[1] // self.cfg.image_seq_len
        imgs = vae.decode(toks.reshape(b * t, self.cfg.image_seq_len))
        return imgs.reshape((b, t) + imgs.shape[1:])


DEFAULT_MP_CONFIG = {
    'T1_n': 10, 'T2_n': 10, 'T3_n': 30, 'N1_n': 0.9, 'N2_n': 0.1,
    'N3_n': 0.125, 'N4_n': 0.0625,
    'T1_t': 10, 'T2_t': 5, 'T3_t': 35, 'N1_t': 0.0, 'N2_t': 0.0,
    'N3_t': 0.0, 'N4_t': 0.0,
    'T': 20, 'B': 1,
}
