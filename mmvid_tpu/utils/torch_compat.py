"""Torch-checkpoint compatibility: load the reference's released weights into
this framework's pytrees (hard requirement, SURVEY.md §5 checkpoint/resume).

Formats understood:
* taming VQGAN ``.ckpt`` — Lightning dict with weights under ``state_dict``
  (reference taming/models/vqgan.py:55-64, loaded non-strict in
  mmvid_pytorch/vae.py:28-30).
* MMVID ``dalle.pt`` — ``{iter, hparams, vae_params, weights, optimizer}``
  (reference utils/utils_train.py:297-305).
* OpenAI CLIP ``ViT-B-32.pt`` — torch.jit archive
  (reference mmvid_pytorch/transformers/clip_model.py:535).

torch is a *load-time only* dependency: everything is converted to numpy and
never touches torch at runtime.

Layout conversions:
* Conv2d  (O, I, kh, kw)  ->  NHWC HWIO  (kh, kw, I, O)
* Linear  (O, I)          ->  (I, O)
* Norm weight/bias        ->  scale/bias unchanged
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def load_torch_state_dict(path: str, key: str | None = 'state_dict'
                          ) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into a flat {name: np.ndarray} dict."""
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=False)
    if key is not None and isinstance(obj, dict) and key in obj:
        obj = obj[key]
    if hasattr(obj, 'state_dict'):
        obj = obj.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, 'detach')}


def load_torchjit_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch.jit archive (e.g. ViT-B-32.pt) state dict."""
    import torch
    model = torch.jit.load(path, map_location='cpu')
    return {k: v.detach().cpu().float().numpy()
            for k, v in model.state_dict().items()}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _assign(tree: Dict[str, Any], path: list[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# ---------------------------------------------------------------------------
# VQGAN
# ---------------------------------------------------------------------------

_VQ_SUBS = [
    (re.compile(r'\bdown\.(\d+)\.block\.(\d+)\b'), r'down_\1_block_\2'),
    (re.compile(r'\bdown\.(\d+)\.attn\.(\d+)\b'), r'down_\1_attn_\2'),
    (re.compile(r'\bdown\.(\d+)\.downsample\b'), r'down_\1_downsample'),
    (re.compile(r'\bup\.(\d+)\.block\.(\d+)\b'), r'up_\1_block_\2'),
    (re.compile(r'\bup\.(\d+)\.attn\.(\d+)\b'), r'up_\1_attn_\2'),
    (re.compile(r'\bup\.(\d+)\.upsample\b'), r'up_\1_upsample'),
    (re.compile(r'\bmid\.block_1\b'), 'mid_block_1'),
    (re.compile(r'\bmid\.attn_1\b'), 'mid_attn_1'),
    (re.compile(r'\bmid\.block_2\b'), 'mid_block_2'),
]

_NORM_NAMES = {'norm', 'norm1', 'norm2', 'norm_out'}


def convert_vqgan(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """taming VQModel state_dict -> flax params for mmvid_tpu VQModel.

    Ignores training-only keys (``loss.*`` discriminator/LPIPS), matching the
    reference's non-strict load (mmvid_pytorch/vae.py:30).
    """
    params: Dict[str, Any] = {}
    for name, w in sd.items():
        if name.startswith('loss.') or name.startswith('colorize'):
            continue
        if name == 'quantize.embedding.weight':
            _assign(params, ['quantize', 'embedding'], np.asarray(w))
            continue
        key = name
        for rx, sub in _VQ_SUBS:
            key = rx.sub(sub, key)
        parts = key.split('.')
        leaf = parts[-1]
        mod = parts[-2]
        if leaf == 'weight':
            if w.ndim == 4:
                _assign(params, parts[:-1] + ['kernel'], _conv_kernel(w))
            elif mod in _NORM_NAMES or any(p in _NORM_NAMES for p in parts):
                _assign(params, parts[:-1] + ['scale'], np.asarray(w))
            else:
                _assign(params, parts[:-1] + ['kernel'],
                        np.asarray(w).T if w.ndim == 2 else np.asarray(w))
        elif leaf == 'bias':
            _assign(params, parts[:-1] + ['bias'], np.asarray(w))
        else:
            _assign(params, parts, np.asarray(w))
    return params


def load_vqgan_checkpoint(path: str) -> Dict[str, Any]:
    return convert_vqgan(load_torch_state_dict(path, key='state_dict'))


# ---------------------------------------------------------------------------
# CLIP backbone (transformer stack only, as used by OpenAICLIPTransformer)
# ---------------------------------------------------------------------------

def convert_clip_resblocks(sd: Dict[str, np.ndarray], prefix: str
                           ) -> Dict[str, Any]:
    """Convert ``{prefix}.resblocks.{i}.*`` of a CLIP state_dict to the flax
    params of mmvid_tpu.models.clip.TransformerStack.

    The reference jit-loads ViT-B-32.pt and pulls either ``transformer``
    (text, width 512) or ``visual.transformer`` (width 768)
    (clip_model.py:538-543).  nn.MultiheadAttention's packed in_proj
    (3D, D) splits into q/k/v.
    """
    params: Dict[str, Any] = {}
    head = re.escape(prefix) + r'\.' if prefix else ''
    pat = re.compile(head + r'resblocks\.(\d+)\.(.*)')
    for name, w in sd.items():
        m = pat.match(name)
        if not m:
            continue
        i, rest = int(m.group(1)), m.group(2)
        blk = f'blocks_{i}'
        w = np.asarray(w, dtype=np.float32)
        if rest == 'attn.in_proj_weight':
            d = w.shape[1]
            for j, nm in enumerate(('query', 'key', 'value')):
                _assign(params, [blk, 'attn', nm, 'kernel'],
                        w[j * d:(j + 1) * d].T)
        elif rest == 'attn.in_proj_bias':
            d = w.shape[0] // 3
            for j, nm in enumerate(('query', 'key', 'value')):
                _assign(params, [blk, 'attn', nm, 'bias'],
                        w[j * d:(j + 1) * d])
        elif rest == 'attn.out_proj.weight':
            _assign(params, [blk, 'attn', 'out', 'kernel'], w.T)
        elif rest == 'attn.out_proj.bias':
            _assign(params, [blk, 'attn', 'out', 'bias'], w)
        elif rest == 'ln_1.weight':
            _assign(params, [blk, 'ln_1', 'scale'], w)
        elif rest == 'ln_1.bias':
            _assign(params, [blk, 'ln_1', 'bias'], w)
        elif rest == 'ln_2.weight':
            _assign(params, [blk, 'ln_2', 'scale'], w)
        elif rest == 'ln_2.bias':
            _assign(params, [blk, 'ln_2', 'bias'], w)
        elif rest == 'mlp.c_fc.weight':
            _assign(params, [blk, 'mlp', 'fc', 'kernel'], w.T)
        elif rest == 'mlp.c_fc.bias':
            _assign(params, [blk, 'mlp', 'fc', 'bias'], w)
        elif rest == 'mlp.c_proj.weight':
            _assign(params, [blk, 'mlp', 'proj', 'kernel'], w.T)
        elif rest == 'mlp.c_proj.bias':
            _assign(params, [blk, 'mlp', 'proj', 'bias'], w)
    return params


def clip_stack_dims(sd: Dict[str, np.ndarray], prefix: str):
    """(width, n_layers, n_heads) of a CLIP resblock stack."""
    head = f'{prefix}.' if prefix else ''
    layers = {int(m.group(1)) for m in
              (re.match(re.escape(head) + r'resblocks\.(\d+)\.', k)
               for k in sd) if m}
    width = sd[f'{head}resblocks.0.ln_1.weight'].shape[0]
    return width, len(layers), width // 64


# ---------------------------------------------------------------------------
# BERT / ARTV (dalle.pt)
# ---------------------------------------------------------------------------

_SEQ_HEADS = {  # torch Sequential(LayerNorm, Linear) head names
    'to_logits': ('to_logits_ln', 'to_logits_fc'),
    'to_logits_rel': ('to_logits_rel_ln', 'to_logits_rel_fc'),
    'to_logits_vid': ('to_logits_vid_ln', 'to_logits_vid_fc'),
}

_TFM_BOTTLENECK = {  # Sequential(LN, Linear, LN, Linear, LN)
    '0': 'tfm_ln0', '1': 'tfm_fc0', '2': 'tfm_ln1', '3': 'tfm_fc1',
    '4': 'tfm_ln2',
}


def convert_bert(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """dalle.pt ``weights`` state_dict -> flax params for BertCore.

    Also extracts the frozen VQGANs stored inside the checkpoint
    (``vae.model.*`` / ``cvae.model.*``) -> params under '_vae' / '_cvae'
    side keys for the caller to hand to VQGanVAE.
    (Checkpoint format: utils/utils_train.py:297-305; module names from
    mmvid_pytorch/dalle_bert.py:259-432.)
    """
    params: Dict[str, Any] = {}
    vae_sd: Dict[str, np.ndarray] = {}
    cvae_sd: Dict[str, np.ndarray] = {}
    clip_sd: Dict[str, np.ndarray] = {}

    for name, w in sd.items():
        w = np.asarray(w)
        if name.startswith('vae.model.'):
            vae_sd[name[len('vae.model.'):]] = w
            continue
        if name.startswith('cvae.model.'):
            cvae_sd[name[len('cvae.model.'):]] = w
            continue
        if name.startswith('transformer.transformer.'):
            clip_sd[name[len('transformer.'):]] = w
            continue
        if name.endswith('_emb.weight') and '.' not in name[:-7]:
            # {text,text_pos,image,visual,special,special_pos}_emb
            _assign(params, [name[:-7], 'embedding'], w)
            continue
        if name.startswith('target_pos_emb.') or \
                name.startswith('image_pos_emb.'):  # ARTV axial pos emb
            root, leaf = name.split('.', 1)
            _assign(params, [root, leaf], w)
            continue
        if name.startswith('visual_pos_emb.module_list.'):
            _, _, i, leaf = name.split('.')
            _assign(params, ['visual_pos_emb', f'module_list_{i}', leaf], w)
            continue
        head = name.split('.')[0]
        if head in _SEQ_HEADS:
            _, idx, leaf = name.split('.')
            ln_name, fc_name = _SEQ_HEADS[head]
            if idx == '0':  # LayerNorm
                _assign(params, [ln_name,
                                 'scale' if leaf == 'weight' else 'bias'], w)
            else:           # Linear
                _assign(params, [fc_name,
                                 'kernel' if leaf == 'weight' else 'bias'],
                        w.T if leaf == 'weight' else w)
            continue
        if name.startswith('text_feature_mapping.'):
            parts = name.split('.')
            if len(parts) == 2:  # plain Linear
                leaf = parts[1]
                _assign(params, ['tfm_fc',
                                 'kernel' if leaf == 'weight' else 'bias'],
                        w.T if leaf == 'weight' else w)
            else:
                idx, leaf = parts[1], parts[2]
                target = _TFM_BOTTLENECK[idx]
                if target.startswith('tfm_ln'):
                    _assign(params, [target,
                                     'scale' if leaf == 'weight' else 'bias'],
                            w)
                else:
                    _assign(params, [target,
                                     'kernel' if leaf == 'weight' else 'bias'
                                     ], w.T if leaf == 'weight' else w)
            continue
        # unknown / vestigial keys are skipped (reference loads non-strict
        # at test time, test.py:133-153)

    if clip_sd:
        params['transformer'] = convert_clip_resblocks(clip_sd, 'transformer')
    out = {'params': params}
    if vae_sd:
        out['_vae'] = convert_vqgan(vae_sd)
    if cvae_sd:
        out['_cvae'] = convert_vqgan(cvae_sd)
    return out


def load_dalle_checkpoint(path: str):
    """Load dalle.pt -> (iter, hparams, vae_params_meta, converted trees)."""
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=False)
    weights = {k: v.detach().cpu().numpy() for k, v in obj['weights'].items()}
    trees = convert_bert(weights)
    return {
        'iter': obj.get('iter', 0),
        'hparams': obj.get('hparams', {}),
        'vae_params': obj.get('vae_params', None),
        'params': trees['params'],
        'vae': trees.get('_vae'),
        'cvae': trees.get('_cvae'),
    }


# ---------------------------------------------------------------------------
# Reverse conversion: flax params -> reference-format state_dicts
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v)


def bert_params_to_torch(params: Dict[str, Any],
                         vae_params: Dict[str, Any] | None = None,
                         cvae_params: Dict[str, Any] | None = None
                         ) -> Dict[str, np.ndarray]:
    """BertCore flax params -> the reference BERT state_dict naming, so
    checkpoints written by this framework load in the reference
    (utils/utils_train.py:297-305 'weights' payload).  Inverse of
    convert_bert."""
    inv_heads = {name: head for head, names in _SEQ_HEADS.items()
                 for name in names}
    inv_tfm = {v: k for k, v in _TFM_BOTTLENECK.items()}
    sd: Dict[str, np.ndarray] = {}
    qkv: Dict[str, Dict[str, np.ndarray]] = {}

    for path, w in _flatten(params):
        name = '/'.join(path)
        if path[0] == 'transformer':
            blk = path[1]          # blocks_<i>
            i = blk.split('_')[1]
            base = f'transformer.transformer.resblocks.{i}'
            if path[2] == 'attn':
                proj, leaf = path[3], path[4]
                if proj in ('query', 'key', 'value'):
                    qkv.setdefault(f'{base}|{leaf}', {})[proj] = w
                else:  # out
                    tgt = (f'{base}.attn.out_proj.weight' if leaf == 'kernel'
                           else f'{base}.attn.out_proj.bias')
                    sd[tgt] = w.T if leaf == 'kernel' else w
            elif path[2] in ('ln_1', 'ln_2'):
                leaf = 'weight' if path[3] == 'scale' else 'bias'
                sd[f'{base}.{path[2]}.{leaf}'] = w
            elif path[2] == 'mlp':
                tname = {'fc': 'c_fc', 'proj': 'c_proj'}[path[3]]
                leaf = path[4]
                sd[f'{base}.mlp.{tname}.' +
                   ('weight' if leaf == 'kernel' else 'bias')] = \
                    w.T if leaf == 'kernel' else w
        elif path[-1] == 'embedding':
            sd[f'{path[0]}.weight'] = w
        elif path[0] in ('target_pos_emb', 'image_pos_emb'):
            sd[f'{path[0]}.{path[1]}'] = w
        elif path[0] == 'visual_pos_emb':
            i = path[1].split('_')[-1]
            sd[f'visual_pos_emb.module_list.{i}.{path[2]}'] = w
        elif path[0] in inv_heads:
            head = inv_heads[path[0]]
            idx = '0' if path[0].endswith('_ln') else '1'
            if idx == '0':
                leaf = 'weight' if path[1] == 'scale' else 'bias'
                sd[f'{head}.{idx}.{leaf}'] = w
            else:
                leaf = 'weight' if path[1] == 'kernel' else 'bias'
                sd[f'{head}.{idx}.{leaf}'] = w.T if leaf == 'weight' else w
        elif path[0] in inv_tfm:
            tidx = inv_tfm[path[0]]
            if path[0].startswith('tfm_ln'):
                leaf = 'weight' if path[1] == 'scale' else 'bias'
                sd[f'text_feature_mapping.{tidx}.{leaf}'] = w
            else:
                leaf = 'weight' if path[1] == 'kernel' else 'bias'
                sd[f'text_feature_mapping.{tidx}.{leaf}'] = \
                    w.T if leaf == 'weight' else w
        elif path[0] == 'tfm_fc':
            leaf = 'weight' if path[1] == 'kernel' else 'bias'
            sd[f'text_feature_mapping.{leaf}'] = \
                w.T if leaf == 'weight' else w

    # repack q/k/v into torch's in_proj
    for key, parts in qkv.items():
        base, leaf = key.split('|')
        q, k, v = parts['query'], parts['key'], parts['value']
        if leaf == 'kernel':
            sd[f'{base}.attn.in_proj_weight'] = np.concatenate(
                [q.T, k.T, v.T], axis=0)
        else:
            sd[f'{base}.attn.in_proj_bias'] = np.concatenate([q, k, v])

    for tree, prefix in ((vae_params, 'vae.model.'),
                         (cvae_params, 'cvae.model.')):
        if tree is not None:
            sd.update(vqgan_params_to_torch(tree, prefix))
    return sd


def vqgan_params_to_torch(params: Dict[str, Any], prefix: str = ''
                          ) -> Dict[str, np.ndarray]:
    """Inverse of convert_vqgan: flax VQModel params -> taming naming."""
    inv_subs = [
        (re.compile(r'\bdown_(\d+)_block_(\d+)\b'), r'down.\1.block.\2'),
        (re.compile(r'\bdown_(\d+)_attn_(\d+)\b'), r'down.\1.attn.\2'),
        (re.compile(r'\bdown_(\d+)_downsample\b'), r'down.\1.downsample'),
        (re.compile(r'\bup_(\d+)_block_(\d+)\b'), r'up.\1.block.\2'),
        (re.compile(r'\bup_(\d+)_attn_(\d+)\b'), r'up.\1.attn.\2'),
        (re.compile(r'\bup_(\d+)_upsample\b'), r'up.\1.upsample'),
        (re.compile(r'\bmid_block_1\b'), 'mid.block_1'),
        (re.compile(r'\bmid_attn_1\b'), 'mid.attn_1'),
        (re.compile(r'\bmid_block_2\b'), 'mid.block_2'),
    ]
    sd: Dict[str, np.ndarray] = {}
    for path, w in _flatten(params):
        if path == ('quantize', 'embedding'):
            sd[prefix + 'quantize.embedding.weight'] = w
            continue
        name = '.'.join(path[:-1])
        for rx, sub in inv_subs:
            name = rx.sub(sub, name)
        leaf = path[-1]
        if leaf == 'kernel':
            sd[prefix + name + '.weight'] = np.transpose(w, (3, 2, 0, 1))
        elif leaf == 'scale':
            sd[prefix + name + '.weight'] = w
        else:
            sd[prefix + name + '.bias'] = w
    return sd


def save_dalle_checkpoint(path: str, *, params, iter: int = 0,
                          hparams: Dict | None = None, vae_params=None,
                          cvae_params=None, vae_cfg_params=None):
    """Write a reference-format dalle.pt ({iter, hparams, vae_params,
    weights}, utils/utils_train.py:297-305).

    The reference format also carries 'optimizer' (torch Adam state keyed
    by parameter ORDER of the live nn.Module instance); exporting optax
    moments into that keying would require instantiating the torch
    reference to recover its parameter order, so it is intentionally
    omitted — native resume (orbax opt_state leaves,
    mmvid_tpu.training.opt_state_leaves) is the supported path, and the
    reference loads dalle.pt weights fine without 'optimizer'."""
    import torch
    t = params.get('transformer', {})
    if 'blocks' in t:
        # pipeline-parallel training stores blocks stacked; the reference
        # format is per-block
        import jax
        from mmvid_tpu.parallel.pipeline import unstack_block_params
        # NB: the keyword parameter `iter` shadows the builtin here, so
        # index the leaves list instead of calling iter().
        n_layers = jax.tree_util.tree_leaves(t['blocks'])[0].shape[0]
        params = {**params,
                  'transformer': unstack_block_params(t, n_layers)}
    sd = bert_params_to_torch(params, vae_params, cvae_params)
    torch.save({
        'iter': iter,
        'hparams': hparams or {},
        'vae_params': vae_cfg_params,
        'weights': {k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()},
    }, path)


def to_f32_tree(tree):
    """Cast every leaf to float32 (checkpoints may ship fp16)."""
    import jax
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x, dtype=np.float32)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else np.asarray(x),
        tree)
