"""BERT-style non-autoregressive multimodal video transformer.

Parity target: mmvid_pytorch/dalle_bert.py:259-1127 (class BERT).

Sequence layout (dalle_bert.py:360-385):
  [REL](1) | text(text_seq_len) | visual(num_visuals*n (+SEP)) |
  [ST1],[VID](2) | target(num_targets*n)          n = fmap^2 (64 for 128px)

Token LUTs: image tokens 0..1023 plus [MASK]=1024, [SEP]=1025
(dalle_bert.py:343-346); special tokens {[REL]:0,[ST1]:1,[VID]:2,[ST3]:3,
[ST4]:4} with their own embedding + positional tables (dalle_bert.py:360-374).

Text padding id 0 is remapped to a per-position unique id
(dalle_bert.py:917-919).

TPU-first departures from the reference:
* The model is a pure Flax module; all randomness (masking strategies, REL
  control swap, VID warps) comes in via explicit jax.random keys in
  mmvid_tpu.models.masking / mmvid_tpu.models.warp, so the whole 3-forward
  training step compiles into one XLA program (the reference does host-side
  numpy RNG + un-jittable torchvision ops per step, train call stack
  SURVEY.md §3.1).
* Batched throughout; the mask-predict sampler (mmvid_tpu.models.sampler)
  vectorizes over batch x beam instead of the reference's per-sample python
  loop (dalle_bert.py:618).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmvid_tpu.models.axial import (
    AxialPositionalEmbedding,
    AxialPositionalEmbeddingList,
)
from mmvid_tpu.models.clip import (
    ClipStackConfig,
    TransformerStack,
    build_attention_mask,
)


@dataclasses.dataclass(frozen=True)
class BertConfig:
    dim: int = 768
    num_text_tokens: int = 10000       # raw vocab; padding ids appended below
    text_seq_len: int = 50
    num_visuals: int = 0
    num_targets: int = 8
    num_image_tokens: int = 1024
    image_fmap_size: int = 8
    image_size: int = 128
    insert_sep: bool = False
    use_separate_visual_emb: bool = False
    fixed_language_model: Optional[str] = None
    text_feature_dim: int = 0
    text_emb_bottleneck: Optional[int] = None
    stable: bool = False
    clip: ClipStackConfig = ClipStackConfig()

    # ----- derived layout (dalle_bert.py:301-385) -----
    @property
    def effective_text_seq_len(self) -> int:
        return 1 if self.fixed_language_model else self.text_seq_len

    @property
    def effective_num_text_tokens(self) -> int:
        # unique padding token per position (dalle_bert.py:303)
        if self.fixed_language_model:
            return 1
        return self.num_text_tokens + self.text_seq_len

    @property
    def image_seq_len(self) -> int:
        return self.image_fmap_size ** 2

    @property
    def visual_seq_len(self) -> int:
        return (self.num_visuals * self.image_seq_len
                + self.num_visuals * int(self.insert_sep))

    @property
    def target_seq_len(self) -> int:
        return self.num_targets * self.image_seq_len

    @property
    def before_control_seq_len(self) -> int:
        return 1  # [REL]

    @property
    def after_control_seq_len(self) -> int:
        return 2  # [ST1], [VID]

    @property
    def control_seq_len(self) -> int:
        return (self.before_control_seq_len + self.effective_text_seq_len
                + self.visual_seq_len + self.after_control_seq_len)

    @property
    def total_seq_len(self) -> int:
        return self.control_seq_len + self.target_seq_len

    @property
    def rel_tok_index(self) -> int:
        return 0

    @property
    def st1_tok_index(self) -> int:
        return (self.before_control_seq_len + self.effective_text_seq_len
                + self.visual_seq_len)

    @property
    def vid_tok_index(self) -> int:
        return self.st1_tok_index + 1

    @property
    def txt_tok_index(self) -> int:
        return self.before_control_seq_len

    @property
    def mask_token(self) -> int:
        return self.num_image_tokens      # [MASK] (dalle_bert.py:343)

    @property
    def sep_token(self) -> int:
        return self.num_image_tokens + 1  # [SEP]


_EMB_INIT = nn.initializers.normal(1.0)  # torch nn.Embedding default N(0,1)


class BertCore(nn.Module):
    """All learned parameters + the transformer forward.

    Submodule/param names are chosen so the dalle.pt 'weights' state_dict
    (utils/utils_train.py:297-305 format) maps 1:1 via
    mmvid_tpu.utils.torch_compat.convert_bert.
    """
    cfg: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        if cfg.fixed_language_model is None:
            self.text_emb = nn.Embed(cfg.effective_num_text_tokens, cfg.dim,
                                     embedding_init=_EMB_INIT)
            self.text_pos_emb = nn.Embed(cfg.effective_text_seq_len, cfg.dim,
                                         embedding_init=_EMB_INIT)
        else:
            # LN -> Linear -> LN -> Linear -> LN bottleneck, or single Linear
            # (dalle_bert.py:307-322)
            if cfg.text_emb_bottleneck is not None:
                nf = int(cfg.text_emb_bottleneck)
                self.tfm_ln0 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
                self.tfm_fc0 = nn.Dense(nf, dtype=self.dtype)
                self.tfm_ln1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
                self.tfm_fc1 = nn.Dense(cfg.dim, dtype=self.dtype)
                self.tfm_ln2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
            else:
                self.tfm_fc = nn.Dense(cfg.dim, dtype=self.dtype)

        self.image_emb = nn.Embed(cfg.num_image_tokens + 2, cfg.dim,
                                  embedding_init=_EMB_INIT)
        self.target_pos_emb = AxialPositionalEmbedding(
            cfg.dim, (cfg.num_targets, cfg.image_fmap_size,
                      cfg.image_fmap_size))
        if cfg.num_visuals > 0:
            if cfg.use_separate_visual_emb:
                self.visual_emb = nn.Embed(cfg.num_image_tokens + 2, cfg.dim,
                                           embedding_init=_EMB_INIT)
            self.visual_pos_emb = AxialPositionalEmbeddingList(
                cfg.dim, cfg.num_visuals,
                (cfg.image_fmap_size, cfg.image_fmap_size))

        self.special_emb = nn.Embed(5, cfg.dim, embedding_init=_EMB_INIT)
        self.special_pos_emb = nn.Embed(5, cfg.dim, embedding_init=_EMB_INIT)

        self.transformer = TransformerStack(cfg.clip, dtype=self.dtype)

        self.to_logits_ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.to_logits_fc = nn.Dense(cfg.num_image_tokens, dtype=self.dtype)
        self.to_logits_rel_ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.to_logits_rel_fc = nn.Dense(1, dtype=self.dtype)
        self.to_logits_vid_ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.to_logits_vid_fc = nn.Dense(1, dtype=self.dtype)

    # ------------------------------------------------------------------
    def text_feature_mapping(self, feat):
        cfg = self.cfg
        if cfg.text_emb_bottleneck is not None:
            h = self.tfm_ln0(feat).astype(self.dtype)
            h = self.tfm_fc0(h)
            h = self.tfm_ln1(h).astype(self.dtype)
            h = self.tfm_fc1(h)
            return self.tfm_ln2(h)
        return self.tfm_fc(feat)

    def control_embedding(self, text, visual_tokens=None,
                          drop_visual=False):
        """Assemble the control prefix embedding (dalle_bert.py:901-973).

        text: [B, text_seq_len] int tokens, or [B, text_feature_dim] floats
        when cfg.fixed_language_model is set.
        visual_tokens: [B, visual_seq_len] int tokens (already corrupted /
        SEP-inserted as needed), or None when num_visuals == 0.
        drop_visual: negvc negative-control layout — the reference NEVER
        appends a visual segment to control_neg_emb (dalle_bert.py:909-975),
        so the negative sequence is [REL]+text_neg+[ST1][VID], shorter than
        the positive when num_visuals > 0.
        Returns [B, control_seq_len(-visual_seq_len), D] float32.
        """
        cfg = self.cfg
        b = text.shape[0]

        before_tok = jnp.zeros((b, 1), jnp.int32)  # [REL] id 0
        before = (self.special_emb(before_tok)
                  + self.special_pos_emb(before_tok))
        parts = [before]

        if cfg.fixed_language_model is None:
            # remap padding 0 -> unique per-position id (dalle_bert.py:917-919)
            text_range = (jnp.arange(cfg.text_seq_len)
                          + (cfg.effective_num_text_tokens
                             - cfg.text_seq_len))
            text = jnp.where(text == 0, text_range[None, :], text)
            t_emb = self.text_emb(text) + self.text_pos_emb(
                jnp.arange(cfg.text_seq_len))[None]
        else:
            t_emb = self.text_feature_mapping(text)[:, None, :]
        parts.append(t_emb)

        if cfg.num_visuals > 0 and not drop_visual:
            assert visual_tokens is not None
            if cfg.use_separate_visual_emb:
                v_emb = self.visual_emb(visual_tokens)
            else:
                v_emb = self.image_emb(visual_tokens)
            v_emb = v_emb + self.visual_pos_emb(v_emb)
            parts.append(v_emb)

        after_tok = jnp.broadcast_to(jnp.array([1, 2], jnp.int32), (b, 2))
        after = self.special_emb(after_tok) + self.special_pos_emb(after_tok)
        parts.append(after)

        return jnp.concatenate(
            [p.astype(jnp.float32) for p in parts], axis=1)

    def target_embedding(self, target_tokens):
        """image_emb(tokens) + axial target pos emb (dalle_bert.py:1032-1033)."""
        emb = self.image_emb(target_tokens)
        return emb + self.target_pos_emb(emb)

    def target_pos_embedding(self, batch: int):
        dummy = jnp.zeros((batch, self.cfg.target_seq_len, self.cfg.dim))
        return self.target_pos_emb(dummy)

    def image_embedding(self, tokens):
        return self.image_emb(tokens)

    def transformer_forward(self, tokens_emb):
        """Full-sequence forward with the mask_prev attention mask
        (dalle_bert.py:489-494).  Shorter sequences (the negvc negative
        control drops the visual segment) get the full-layout mask sliced
        [:L, :L], exactly like the reference (clip_model.py:219-221).

        TPU: the sequence is padded ONCE here to a multiple of 64 (565 ->
        576 for the flagship layout) so every matmul and fusion in the
        stack sees aligned shapes; padded keys carry an additive -inf so
        real rows are numerically unchanged, and pad rows are sliced off
        before the output heads."""
        from mmvid_tpu.models.clip import NEG_INF
        cfg = self.cfg
        mask = build_attention_mask(
            cfg.total_seq_len, 'mask_prev',
            index=(cfg.st1_tok_index, cfg.vid_tok_index))
        L = tokens_emb.shape[1]
        mask = mask[:L, :L]
        Lp = -(-L // 64) * 64
        if Lp != L:
            tokens_emb = jnp.pad(tokens_emb,
                                 ((0, 0), (0, Lp - L), (0, 0)))
            mask = jnp.pad(mask, ((0, Lp - L), (0, Lp - L)),
                           constant_values=NEG_INF)
        out = self.transformer(tokens_emb, mask)
        if Lp != L:
            out = out[:, :L]
        if cfg.stable:
            out = out / jnp.max(out, axis=-1, keepdims=True)
        return out

    def to_logits(self, h):
        return self.to_logits_fc(
            self.to_logits_ln(h).astype(self.dtype)).astype(jnp.float32)

    def to_logits_rel(self, h):
        return self.to_logits_rel_fc(
            self.to_logits_rel_ln(h).astype(self.dtype)).astype(jnp.float32)

    def to_logits_vid(self, h):
        return self.to_logits_vid_fc(
            self.to_logits_vid_ln(h).astype(self.dtype)).astype(jnp.float32)

    def forward_full(self, control_emb, target_emb):
        """control ‖ target -> (msm_logits, rel_logit, vid_logit, hidden)."""
        cfg = self.cfg
        tokens = jnp.concatenate(
            [control_emb, target_emb.astype(jnp.float32)], axis=1)
        out = self.transformer_forward(tokens)
        out_target = out[:, cfg.control_seq_len:, :]
        logits_msm = self.to_logits(out_target)
        logit_rel = self.to_logits_rel(out[:, cfg.rel_tok_index, :])[..., 0]
        logit_vid = self.to_logits_vid(out[:, cfg.vid_tok_index, :])[..., 0]
        return logits_msm, logit_rel, logit_vid, out

    def forward_hidden(self, control_emb, target_emb):
        """Like forward_full but returns the RAW target hidden states
        instead of MSM logits — the fused sampling epilogue
        (mmvid_tpu.ops.sample_head) applies the to_logits head itself so
        the [B, N, vocab] logits never round-trip through HBM."""
        cfg = self.cfg
        tokens = jnp.concatenate(
            [control_emb, target_emb.astype(jnp.float32)], axis=1)
        out = self.transformer_forward(tokens)
        out_target = out[:, cfg.control_seq_len:, :]
        logit_rel = self.to_logits_rel(out[:, cfg.rel_tok_index, :])[..., 0]
        logit_vid = self.to_logits_vid(out[:, cfg.vid_tok_index, :])[..., 0]
        return out_target, logit_rel, logit_vid

    def forward_rel_logit(self, control_emb, target_emb):
        """REL-head logit only — used for the negvc negative forward whose
        control may be shorter than control_seq_len (dalle_bert.py:1048-1055)."""
        tokens = jnp.concatenate(
            [control_emb, target_emb.astype(jnp.float32)], axis=1)
        out = self.transformer_forward(tokens)
        return self.to_logits_rel(out[:, self.cfg.rel_tok_index, :])[..., 0]

    def __call__(self, text, visual_tokens, target_tokens):
        """Convenience full pass used for init/shape-checking."""
        control = self.control_embedding(text, visual_tokens)
        target = self.target_embedding(target_tokens)
        return self.forward_full(control, target)


# ---------------------------------------------------------------------------
# Loss functions (pure; all stochastic inputs precomputed by masking.py)
# ---------------------------------------------------------------------------

def cross_entropy_masked(logits, labels, keep_gt_mask):
    """MSM loss: CE over positions where keep_gt_mask is False
    (dalle_bert.py:1040: loss over ~mask1)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = (~keep_gt_mask.astype(bool)).astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def bce_logits(logit, label):
    """binary_cross_entropy_with_logits, mean reduction."""
    return jnp.mean(jnp.maximum(logit, 0) - logit * label
                    + jnp.log1p(jnp.exp(-jnp.abs(logit))))


def bce_logits_none(logit, label):
    return (jnp.maximum(logit, 0) - logit * label
            + jnp.log1p(jnp.exp(-jnp.abs(logit))))


def swap_halves(x):
    """REL negative control: swap the two batch halves
    (dalle_bert.py:110-122, even batch path)."""
    b = x.shape[0]
    if b % 2 == 0:
        return jnp.concatenate([x[b // 2:], x[:b // 2]], axis=0)
    return jnp.roll(x, 1, axis=0)


def bert_losses(core: BertCore, params, *, text, visual_tokens,
                target_tokens, target_tokens_warp=None, keep_gt_mask=None,
                not_fully_masked=None, rel=False, vid=False,
                rel_no_fully_masked=False, control_neg=None):
    """Compute (loss_msm, loss_rel, loss_vid) (dalle_bert.py:985-1125).

    keep_gt_mask [B, target_seq_len] bool: True = ground-truth token kept
    visible (reference mask1).  target_tokens_warp: VID negatives already
    tokenized.  control_neg: text_neg tokens for negvc mode — the negative
    control is [REL]+text_neg+[ST1][VID] with the visual segment dropped,
    exactly the reference layout (dalle_bert.py:909-975; its visual_neg
    parameter is dead, :885).
    """
    def apply(method, *a, **k):
        return core.apply({'params': params}, *a, method=method, **k)

    cfg = core.cfg
    control_emb = apply(BertCore.control_embedding, text, visual_tokens)

    masked_target = jnp.where(keep_gt_mask, target_tokens, cfg.mask_token)
    target_emb = apply(BertCore.target_embedding, masked_target)

    logits_msm, logit_rel_pos, logit_vid_pos, _ = apply(
        BertCore.forward_full, control_emb, target_emb)
    loss_msm = cross_entropy_masked(logits_msm, target_tokens, keep_gt_mask)

    b = text.shape[0]
    if rel:
        if control_neg is not None:
            control_neg_emb = apply(BertCore.control_embedding, control_neg,
                                    None, drop_visual=True)
        else:
            control_neg_emb = swap_halves(control_emb)
        logit_rel_neg = apply(
            BertCore.forward_rel_logit, control_neg_emb, target_emb)
        ones = jnp.ones((b,), jnp.float32)
        zeros = jnp.zeros((b,), jnp.float32)
        if rel_no_fully_masked:
            nfm = not_fully_masked.astype(jnp.float32)
            loss_rel = (jnp.sum((bce_logits_none(logit_rel_pos, ones)
                                 + bce_logits_none(logit_rel_neg, zeros))
                                * nfm)
                        / jnp.maximum(jnp.sum(nfm), 1.0))
        else:
            loss_rel = (bce_logits(logit_rel_pos, ones)
                        + bce_logits(logit_rel_neg, zeros))
    else:
        loss_rel = jnp.float32(0.0)

    if vid and cfg.num_targets > 1 and target_tokens_warp is not None:
        warp_masked = jnp.where(keep_gt_mask, target_tokens_warp,
                                cfg.mask_token)
        warp_emb = apply(BertCore.target_embedding, warp_masked)
        _, _, logit_vid_neg, _ = apply(
            BertCore.forward_full, control_emb, warp_emb)
        ones = jnp.ones((b,), jnp.float32)
        zeros = jnp.zeros((b,), jnp.float32)
        if rel_no_fully_masked:
            nfm_sum = jnp.maximum(
                jnp.sum(not_fully_masked.astype(jnp.float32)), 1.0)
            loss_vid = (jnp.sum(bce_logits_none(logit_vid_pos, ones))
                        / nfm_sum
                        + jnp.sum(bce_logits_none(logit_vid_neg, zeros))
                        / nfm_sum)
        else:
            loss_vid = (bce_logits(logit_vid_pos, ones)
                        + bce_logits(logit_vid_neg, zeros))
    else:
        loss_vid = jnp.float32(0.0)

    return loss_msm, loss_rel, loss_vid
