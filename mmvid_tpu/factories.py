"""Component factories (reference utils/utils_train.py:16-388).

Builds tokenizers, VQGANs, models, and datasets from parsed args so the
train/test drivers mirror the reference's wiring."""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mmvid_tpu.models.bert import BertConfig
from mmvid_tpu.models.artv import ArtvConfig, ArtvModel
from mmvid_tpu.models.clip import ClipStackConfig, load_openai_clip_stack
from mmvid_tpu.models.mmvid import MMVIDBert
from mmvid_tpu.models.vqgan import VQGanConfig, VQGanVAE
from mmvid_tpu.tokenizer import SimpleTokenizer


def get_tokenizer(args):
    """reference utils_train.py:185-191 ('simple' | 'hug')."""
    which = getattr(args, 'which_tokenizer', 'simple')
    if which == 'simple':
        return SimpleTokenizer(args.bpe_path) if args.bpe_path \
            else SimpleTokenizer()
    if which == 'hug':
        from transformers import AutoTokenizer
        hf = AutoTokenizer.from_pretrained(args.bpe_path)

        class HugWrap:
            vocab_size = hf.vocab_size

            def tokenize(self, texts, context_length, truncate_text=False):
                if isinstance(texts, str):
                    texts = [texts]
                enc = hf(texts, padding='max_length', truncation=True,
                         max_length=context_length)
                return np.asarray(enc['input_ids'], np.int32)

        return HugWrap()
    raise NotImplementedError(which)


def get_fixed_language_model(args):
    """RoBERTa-large feature extractor (reference utils_train.py:194-222):
    returns (encode_fn(texts)->[B,1024] mean-pooled features, feature_dim).
    Uses the Flax port of the HF model; requires local weights
    (zero-egress environments must pass a downloaded path)."""
    assert args.fixed_language_model == 'roberta-large'
    from transformers import AutoTokenizer, FlaxRobertaModel
    path = os.environ.get('ROBERTA_PATH', 'roberta-large')
    tok = AutoTokenizer.from_pretrained(path)
    try:
        model = FlaxRobertaModel.from_pretrained(path)
    except (OSError, EnvironmentError, ValueError):
        # torch-format checkpoint (pytorch_model.bin / model.safetensors)
        model = FlaxRobertaModel.from_pretrained(path, from_pt=True)

    def encode(texts):
        enc = tok(texts, padding=True, truncation=True, max_length=128,
                  return_tensors='np')
        out = model(**enc).last_hidden_state  # [B, L, H]
        mask = enc['attention_mask'][..., None]
        return np.asarray((out * mask).sum(1) / mask.sum(1))

    # 1024 for roberta-large (utils/utils_train.py:194-222)
    return encode, model.config.hidden_size


def get_vae_model(args, which_vae='vae', image_size: Optional[int] = None
                  ) -> VQGanVAE:
    """reference utils_train.py:148-164 + vae.py:15-36."""
    # --which_vae selects the tokenizer class; like the reference, only
    # 'vqgan1024' is implemented (utils_train.py:157-163 raises otherwise)
    kind = getattr(args, 'which_vae', 'vqgan1024')
    if kind != 'vqgan1024':
        raise NotImplementedError(f'which_vae={kind!r}; only vqgan1024 is '
                                  'supported (as in the reference)')
    path = args.vae_path if which_vae == 'vae' else args.cvae_path
    image_size = image_size or args.image_size or 256
    cfg = VQGanConfig(resolution=image_size)
    params = None
    if path:
        from mmvid_tpu.utils.torch_compat import load_vqgan_checkpoint
        params = load_vqgan_checkpoint(path)
    dtype = jnp.bfloat16 if getattr(args, 'bf16', False) or \
        getattr(args, 'fp16', False) else jnp.float32
    return VQGanVAE(params=params, image_size=image_size, cfg=cfg,
                    dtype=dtype)


def build_clip_config(args) -> ClipStackConfig:
    if args.which_transformer == 'openai_clip_visual':
        return ClipStackConfig(width=768, layers=12, heads=12)
    if args.which_transformer == 'openai_clip_text':
        # real ViT-B/32 text stack dims (width 512, 12 layers, 8 heads)
        return ClipStackConfig(width=512, layers=12, heads=8)
    if args.which_transformer.startswith('custom:'):
        # 'custom:<width>:<layers>:<heads>' — train-from-scratch sizes
        _, w, l, h = args.which_transformer.split(':')
        return ClipStackConfig(width=int(w), layers=int(l), heads=int(h))
    raise NotImplementedError(args.which_transformer)


def load_pretrained_stack(args) -> Tuple[ClipStackConfig, Optional[dict]]:
    """Resolve the backbone config and, for openai_clip_* transformers, the
    pretrained resblock params from the ViT-B-32.pt torch.jit archive.

    The reference ALWAYS builds its backbone from the archive
    (clip_model.py:535-543, selected at dalle_bert.py:396-405) — training
    is CLIP finetuning, never random init.  Missing archive -> loud warning
    + random init so smoke runs still work in weightless environments."""
    clip_cfg = build_clip_config(args)
    if not args.which_transformer.startswith('openai_clip'):
        return clip_cfg, None
    path = getattr(args, 'openai_clip_model_path', None)
    if path and os.path.exists(path):
        loaded_cfg, stack_params = load_openai_clip_stack(
            path, args.which_transformer)
        return loaded_cfg, stack_params
    import warnings
    warnings.warn(
        f'openai_clip_model_path {path!r} not found: the '
        f'{args.which_transformer} backbone will be RANDOMLY initialized. '
        'The reference recipe finetunes the pretrained CLIP stack '
        '(clip_model.py:535-543); results will not be comparable without '
        'ViT-B-32.pt.', stacklevel=2)
    return clip_cfg, None


def graft_transformer_params(params: dict, stack_params: dict) -> dict:
    """Replace the model's transformer resblock params with converted
    pretrained ones (shape-checked)."""
    fresh = params['transformer']
    missing = set(fresh) - set(stack_params)
    extra = set(stack_params) - set(fresh)
    assert not missing and not extra, (
        f'pretrained stack keys mismatch: missing={missing} extra={extra}')
    jnp_tree = jnp.asarray  # converted params are numpy

    def check_and_cast(path, fresh_leaf, new_leaf):
        assert fresh_leaf.shape == new_leaf.shape, (
            f'{path}: shape {new_leaf.shape} != expected {fresh_leaf.shape}')
        return jnp_tree(new_leaf).astype(fresh_leaf.dtype)

    import jax
    flat_fresh = jax.tree_util.tree_flatten_with_path(fresh)[0]
    new_flat = jax.tree_util.tree_flatten_with_path(stack_params)[0]
    assert len(flat_fresh) == len(new_flat), 'stack param tree mismatch'
    leaves = []
    for (kp_f, f), (kp_n, n) in zip(flat_fresh, new_flat):
        assert jax.tree_util.keystr(kp_f) == jax.tree_util.keystr(kp_n), (
            f'param path mismatch: {jax.tree_util.keystr(kp_f)} vs '
            f'{jax.tree_util.keystr(kp_n)}')
        leaves.append(check_and_cast(jax.tree_util.keystr(kp_f), f, n))
    out = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(fresh), leaves)
    new_params = dict(params)
    new_params['transformer'] = out
    return new_params


def _pipeline_stages_from_args(args) -> int:
    """pp size from --mesh_shape (e.g. 'dp=2,pp=2,tp=2'); 1 when absent."""
    import re
    spec = getattr(args, 'mesh_shape', None) or ''
    m = re.search(r'pp=(\d+)', spec)
    return int(m.group(1)) if m else 1


def get_dalle(args, vae: VQGanVAE, cvae: Optional[VQGanVAE] = None,
              text_feature_dim: int = 0):
    """Build MMVIDBert (or ARTV core) per args (reference train.py:143-193)."""
    dtype = jnp.bfloat16 if getattr(args, 'bf16', False) or \
        getattr(args, 'fp16', False) else jnp.float32
    clip_cfg, stack_params = load_pretrained_stack(args)
    pp = _pipeline_stages_from_args(args)
    if pp > 1 or getattr(args, 'seq_parallel', False):
        clip_cfg = dataclasses.replace(
            clip_cfg, pipeline_stages=pp,
            pipeline_microbatches=getattr(args, 'pp_microbatches', 2),
            seq_parallel=getattr(args, 'seq_parallel', False))
        if pp > 1 and stack_params is not None:
            from mmvid_tpu.parallel.pipeline import stack_block_params
            stack_params = stack_block_params(stack_params, clip_cfg.layers)
    assert args.dim == clip_cfg.width, (
        f'--dim {args.dim} must match the {args.which_transformer} width '
        f'{clip_cfg.width}')
    if args.ar:
        cfg = ArtvConfig(
            dim=args.dim, num_text_tokens=49408,
            text_seq_len=args.text_seq_len,
            num_visuals=max(args.num_visuals, 1),
            num_targets=args.num_targets,
            num_image_tokens=vae.num_tokens,
            image_fmap_size=vae.fmap_size, image_size=vae.image_size,
            loss_img_weight=args.loss_img_weight, clip=clip_cfg)
        model = ArtvModel(cfg, vae, cvae=cvae, dtype=dtype)
        if stack_params is not None:
            model.params = graft_transformer_params(model.params,
                                                    stack_params)
        return model
    cfg = BertConfig(
        dim=args.dim, num_text_tokens=49408,
        text_seq_len=(args.text_seq_len
                      if args.fixed_language_model is None else 1),
        num_visuals=args.num_visuals, num_targets=args.num_targets,
        num_image_tokens=vae.num_tokens, image_fmap_size=vae.fmap_size,
        image_size=vae.image_size, insert_sep=args.insert_sep,
        use_separate_visual_emb=args.use_separate_visual_emb,
        fixed_language_model=args.fixed_language_model,
        text_feature_dim=text_feature_dim,
        text_emb_bottleneck=args.text_emb_bottleneck, clip=clip_cfg)
    model = MMVIDBert(cfg, vae, cvae=cvae, dtype=dtype)
    if stack_params is not None:
        model.params = graft_transformer_params(model.params, stack_params)
    return model


def get_dataset(args, tokenizer):
    """reference utils_train.py get_dataset: route by args.dataset."""
    from mmvid_tpu.data import (
        TextImageDataset,
        TextMP4Dataset,
        TextVideoDataset,
        VoxDataset,
    )
    keys = None
    if args.dataset_keys:
        keys = [l.strip() for l in open(args.dataset_keys) if l.strip()]
    common = dict(
        text_len=args.text_seq_len, image_size=args.image_size or 128,
        truncate_captions=args.truncate_captions,
        resize_ratio=args.resize_ratio, tokenizer=tokenizer,
        cache=args.dataset_cache, deterministic=args.deterministic,
        frame_step=args.frame_step, frame_num=args.frame_num, keys=keys,
        video_only=args.video_only)
    if args.dataset == 'video_text':
        return TextVideoDataset(args.image_text_folder,
                                return_neg=args.negvc,
                                drop_sentence=args.drop_sentence, **common)
    if args.dataset == 'mp4_text':
        common.pop('keys')
        common.pop('video_only')
        return TextMP4Dataset(args.image_text_folder, keys=keys,
                              video_only=args.video_only,
                              drop_sentence=args.drop_sentence, **common)
    if args.dataset == 'imagestack_text':
        # reference utils_train.py:64-80: TextImageStackDataset in video
        # mode with return_vc=True (first frame as the visual control —
        # the repo class always returns it)
        from mmvid_tpu.data import TextImageStackDataset
        return TextImageStackDataset(
            args.image_text_folder, text_len=args.text_seq_len,
            image_size=args.image_size or 128,
            truncate_captions=args.truncate_captions,
            resize_ratio=args.resize_ratio, tokenizer=tokenizer,
            deterministic=args.deterministic, frame_step=args.frame_step,
            frame_num=args.frame_num, keys=keys,
            video_only=args.video_only, cache=args.dataset_cache)
    if args.dataset == 'image_text':
        return TextImageDataset(
            args.image_text_folder, text_len=args.text_seq_len,
            image_size=args.image_size or 128,
            truncate_captions=args.truncate_captions,
            resize_ratio=args.resize_ratio, tokenizer=tokenizer,
            cache=args.dataset_cache, deterministic=args.deterministic)
    if args.dataset in ('vox', 'mmvoxceleb'):
        return VoxDataset(args.image_text_folder, attr_mode=args.attr_mode,
                          return_neg=args.negvc, **common)
    if args.dataset == 'iper':
        from mmvid_tpu.data.iper import IPERDataset
        return IPERDataset(args.image_text_folder, slow=args.slow,
                           attr_mode=args.attr_mode, **common)
    if args.dataset == 'shape':
        from mmvid_tpu.data.shapes import ShapeDataset
        return ShapeDataset(args.image_text_folder,
                            attr_mode=args.attr_mode, **common)
    if args.dataset == 'shape_attr':
        from mmvid_tpu.data.shapes import ShapeAttrDataset
        return ShapeAttrDataset(args.image_text_folder,
                                attr_mode=args.attr_mode,
                                return_neg=args.negvc, **common)
    raise NotImplementedError(args.dataset)
