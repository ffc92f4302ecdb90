"""Import the reference implementation (/root/reference) as a numerical
oracle for parity tests.

The reference is UNTRUSTED third-party code used strictly as a black-box
oracle: we run its modules on random inputs and compare outputs.  Several of
its dependencies are not installed (pytorch_lightning, omegaconf, ftfy,
torchvision, axial_positional_embedding, dominate, decord); this module
injects minimal stand-ins into sys.modules so the model code imports.  The
stand-ins only stub APIs that are irrelevant to the numerics under test —
except AxialPositionalEmbedding, which is a faithful reimplementation of the
lucidrains package (summed per-axis parameters, names ``weights_{i}``) since
the BERT model uses it in its forward pass.
"""

from __future__ import annotations

import importlib
import sys
import types
from functools import reduce
from operator import mul

REFERENCE = '/root/reference'


def _stub_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    # a real ModuleSpec: importlib.util.find_spec(name) raises ValueError on
    # modules whose __spec__ is None (transformers probes torchvision this
    # way when deciding optional-dependency availability)
    import importlib.machinery
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = mod
    return mod


def install_reference(need_bert_deps: bool = False):
    """Make ``taming`` / ``mmvid_pytorch`` importable from /root/reference."""
    import torch
    import torch.nn as nn

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    # pytorch_lightning -> plain nn.Module
    if 'pytorch_lightning' not in sys.modules:
        pl = _stub_module('pytorch_lightning')
        pl.LightningModule = nn.Module

    # utils.utils.instantiate_from_config — resolve dotted targets.
    # (The real reference utils.utils imports torchvision, which is absent.)
    if 'utils' not in sys.modules or not hasattr(
            sys.modules.get('utils', None), 'utils'):
        utils_pkg = _stub_module('utils')
        utils_utils = _stub_module('utils.utils')
        utils_pkg.utils = utils_utils

        def instantiate_from_config(config):
            target = config['target'] if isinstance(config, dict) \
                else config.target
            module, cls = target.rsplit('.', 1)
            params = (config.get('params', {}) if isinstance(config, dict)
                      else getattr(config, 'params', {})) or {}
            return getattr(importlib.import_module(module), cls)(**params)

        class DivideMax(nn.Module):
            def __init__(self, dim):
                super().__init__()
                self.dim = dim

            def forward(self, x):
                return x / x.amax(dim=self.dim, keepdim=True)

        utils_utils.instantiate_from_config = instantiate_from_config
        utils_utils.DivideMax = DivideMax

    if need_bert_deps:
        _install_bert_deps()


def _install_bert_deps():
    import torch
    import torch.nn as nn

    # --- axial_positional_embedding: faithful reimplementation ---
    if 'axial_positional_embedding' not in sys.modules:
        ape = _stub_module('axial_positional_embedding')

        class AxialPositionalEmbedding(nn.Module):
            def __init__(self, dim, axial_shape, axial_dims=None):
                super().__init__()
                self.dim = dim
                self.shape = axial_shape
                self.max_seq_len = reduce(mul, axial_shape, 1)
                self.summed = axial_dims is None
                axial_dims = ((dim,) * len(axial_shape)) if self.summed \
                    else axial_dims
                for ind, (shape, axial_dim) in enumerate(
                        zip(self.shape, axial_dims)):
                    ax_shape = [1] * len(self.shape)
                    ax_shape[ind] = shape
                    ax_shape = (1, *ax_shape, axial_dim)
                    param = nn.Parameter(torch.zeros(ax_shape).normal_(0, 1))
                    setattr(self, f'weights_{ind}', param)
                self.n_axes = len(self.shape)

            def forward(self, x):
                b, t, _ = x.shape
                embs = []
                for i in range(self.n_axes):
                    ax_emb = getattr(self, f'weights_{i}')
                    axial_dim = ax_emb.shape[-1]
                    expand_shape = (b, *self.shape, axial_dim)
                    emb = ax_emb.expand(expand_shape).reshape(
                        b, self.max_seq_len, axial_dim)
                    embs.append(emb)
                pos_emb = sum(embs) if self.summed \
                    else torch.cat(embs, dim=-1)
                return pos_emb[:, :t].to(x)

        ape.AxialPositionalEmbedding = AxialPositionalEmbedding

    # --- torchvision.transforms.RandomErasing (random-box masking) ---
    if 'torchvision' not in sys.modules:
        tv = _stub_module('torchvision')
        transforms = _stub_module('torchvision.transforms')
        tv.transforms = transforms

        class RandomErasing:
            """Minimal RandomErasing: erases a random box (p, scale, ratio,
            value semantics as torchvision)."""

            def __init__(self, p=0.5, scale=(0.02, 0.33), ratio=(0.3, 3.3),
                         value=0):
                self.p = p
                self.scale = scale
                self.ratio = ratio
                self.value = value

            def __call__(self, img):
                import math
                import random as _random
                if _random.random() > self.p:
                    return img
                out = img.clone()
                c, h, w = out.shape[-3], out.shape[-2], out.shape[-1]
                area = h * w
                for _ in range(10):
                    target = area * _random.uniform(*self.scale)
                    log_r = (math.log(self.ratio[0]), math.log(self.ratio[1]))
                    r = math.exp(_random.uniform(*log_r))
                    eh = int(round(math.sqrt(target * r)))
                    ew = int(round(math.sqrt(target / r)))
                    if eh < h and ew < w:
                        i = _random.randint(0, h - eh)
                        j = _random.randint(0, w - ew)
                        out[..., i:i + eh, j:j + ew] = self.value
                        return out
                return out

        transforms.RandomErasing = RandomErasing


class FakeVae:
    """Duck-typed stand-in for VQGanVAE1024 so the reference BERT can be
    built without a real VQGAN (tokens are fed pre-tokenized: the reference
    get_image_tokens passes 2-D inputs through untouched,
    dalle_bert.py:729-751)."""

    def __init__(self, image_size=32, num_layers=2, num_tokens=1024):
        self.image_size = image_size
        self.num_layers = num_layers
        self.num_tokens = num_tokens

    def parameters(self):
        return []


def load_reference_bert(dim=64, heads=2, layers=2, text_seq_len=8,
                        num_text_tokens=100, num_visuals=0, num_targets=2,
                        image_size=32, vae_layers=2, num_tokens=1024,
                        seed=0, **bert_kwargs):
    """Build the reference BERT with a file-free CLIP transformer stack.

    The reference's OpenAICLIPTransformer torch.jit-loads ViT-B-32.pt
    (clip_model.py:535); for oracle purposes we substitute a subclass that
    builds the same reference `Transformer` stack (same ResidualAttentionBlock
    modules, same mask-rewrite logic) with random weights instead of loading
    the file, preserving the ``transformer.transformer.resblocks.*``
    state_dict naming.
    """
    install_reference(need_bert_deps=True)
    import torch
    import torch.nn as nn
    torch.manual_seed(seed)

    from mmvid_pytorch.transformers import clip_model

    class FileFreeCLIPTransformer(clip_model.OpenAICLIPTransformer):
        def __init__(self, seq_len=0, which_model='openai_clip_visual',
                     model_path='', causal=True, mask_type='causal',
                     mask_kwargs=None):
            nn.Module.__init__(self)
            self.context_length = seq_len
            self.causal = causal
            model = clip_model.Transformer(width=dim, layers=layers,
                                           heads=heads)
            if causal:
                for attn_block in model.resblocks:
                    attn_block.attn_mask = self.build_attention_mask(
                        seq_len, mask_type=mask_type, **(mask_kwargs or {}))
            self.transformer = model.float()

    orig = clip_model.OpenAICLIPTransformer
    clip_model.OpenAICLIPTransformer = FileFreeCLIPTransformer
    try:
        import importlib
        dalle_bert = importlib.import_module('mmvid_pytorch.dalle_bert')
        vae = FakeVae(image_size=image_size, num_layers=vae_layers,
                      num_tokens=num_tokens)
        model = dalle_bert.BERT(
            dim=dim, vae=vae, num_text_tokens=num_text_tokens,
            text_seq_len=text_seq_len, num_visuals=num_visuals,
            num_targets=num_targets,
            which_transformer='openai_clip_visual',
            openai_clip_path='', **bert_kwargs)
    finally:
        clip_model.OpenAICLIPTransformer = orig
    model.eval()
    return model


def load_reference_artv(dim=64, heads=2, layers=2, text_seq_len=6,
                        num_text_tokens=50, num_visuals=1, num_targets=2,
                        image_size=32, vae_layers=2, num_tokens=1024,
                        seed=0, **kwargs):
    """Reference dalle_artv.DALLE with a file-free causal CLIP stack."""
    install_reference(need_bert_deps=True)
    import torch
    import torch.nn as nn
    torch.manual_seed(seed)

    from mmvid_pytorch.transformers import clip_model

    class FileFreeCLIPTransformer(clip_model.OpenAICLIPTransformer):
        def __init__(self, seq_len=0, which_model='openai_clip_visual',
                     model_path='', causal=True, mask_type='causal',
                     mask_kwargs=None):
            nn.Module.__init__(self)
            self.context_length = seq_len
            self.causal = causal
            model = clip_model.Transformer(width=dim, layers=layers,
                                           heads=heads)
            if causal:
                for attn_block in model.resblocks:
                    attn_block.attn_mask = self.build_attention_mask(
                        seq_len, mask_type=mask_type, **(mask_kwargs or {}))
            self.transformer = model.float()

    orig = clip_model.OpenAICLIPTransformer
    clip_model.OpenAICLIPTransformer = FileFreeCLIPTransformer
    try:
        import importlib
        dalle_artv = importlib.import_module('mmvid_pytorch.dalle_artv')
        vae = FakeVae(image_size=image_size, num_layers=vae_layers,
                      num_tokens=num_tokens)
        model = dalle_artv.DALLE(
            dim=dim, vae=vae, num_text_tokens=num_text_tokens,
            text_seq_len=text_seq_len, num_visuals=num_visuals,
            num_targets=num_targets,
            which_transformer='openai_clip_visual',
            openai_clip_path='', **kwargs)
    finally:
        clip_model.OpenAICLIPTransformer = orig
    model.eval()
    return model


def load_reference_vqmodel(cfg=None, seed: int = 0):
    """Instantiate the reference taming VQModel with an Identity loss."""
    install_reference()
    import torch
    torch.manual_seed(seed)
    from taming.models.vqgan import VQModel

    ddconfig = dict(
        double_z=False, z_channels=256, resolution=128, in_channels=3,
        out_ch=3, ch=128, ch_mult=[1, 1, 2, 2, 4], num_res_blocks=2,
        attn_resolutions=[16], dropout=0.0)
    if cfg:
        ddconfig.update(cfg)
    model = VQModel(ddconfig=ddconfig,
                    lossconfig={'target': 'torch.nn.Identity'},
                    n_embed=1024, embed_dim=256)
    model.eval()
    return model
