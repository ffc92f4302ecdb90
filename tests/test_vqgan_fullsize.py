"""Full-size VQGAN (shipped vqgan.1024 config @128px) oracle parity — the
exact architecture the released vae_vox.ckpt loads into."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.vqgan import VQGanConfig, VQModel
from mmvid_tpu.utils.torch_compat import convert_vqgan

from oracles import install_reference

pytestmark = pytest.mark.slow


@pytest.mark.slow
def test_fullsize_vqgan_parity():
    install_reference()
    import torch
    torch.manual_seed(0)
    from taming.models.vqgan import VQModel as RefVQModel

    ddconfig = dict(double_z=False, z_channels=256, resolution=128,
                    in_channels=3, out_ch=3, ch=128,
                    ch_mult=[1, 1, 2, 2, 4], num_res_blocks=2,
                    attn_resolutions=[16], dropout=0.0)
    ref = RefVQModel(ddconfig=ddconfig,
                     lossconfig={'target': 'torch.nn.Identity'},
                     n_embed=1024, embed_dim=256)
    with torch.no_grad():
        ref.quantize.embedding.weight.normal_(0, 1.0)
    ref.eval()

    params = convert_vqgan(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    cfg = VQGanConfig(resolution=128)
    model = VQModel(cfg)

    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, size=(1, 128, 128, 3)).astype(np.float32)

    with torch.no_grad():
        _, _, (_, _, idx_ref) = ref.encode(
            torch.from_numpy(x.transpose(0, 3, 1, 2)))
    idx_ref = idx_ref.numpy().reshape(1, -1)

    idx = np.asarray(model.apply({'params': params}, jnp.asarray(x),
                                 method=VQModel.encode_indices)).reshape(
        1, -1)
    assert idx.shape == (1, 64)  # 8x8 token grid at 128px
    agree = (idx == idx_ref).mean()
    assert agree > 0.98, f'full-size index agreement {agree}'

    code = jnp.asarray(rng.randint(0, 1024, (1, 8, 8)), jnp.int32)
    with torch.no_grad():
        z = ref.quantize.embedding(torch.from_numpy(np.asarray(code)).long())
        img_ref = ref.decode(z.permute(0, 3, 1, 2)).numpy().transpose(
            0, 2, 3, 1)
    img = np.asarray(model.apply({'params': params}, code,
                                 method=VQModel.decode_code))
    assert img.shape == (1, 128, 128, 3)
    np.testing.assert_allclose(img, img_ref, rtol=5e-3, atol=5e-3)
