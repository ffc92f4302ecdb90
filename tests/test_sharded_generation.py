"""dp-sharded batch generation: the serving path for multi-chip slices.

The whole compiled generation program is batch-parallel, so placing the
text batch on the dp axis and replicating params lets GSPMD split sampling
across chips — this validates it end-to-end on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mmvid_tpu.models.bert import BertConfig
from mmvid_tpu.models.clip import ClipStackConfig
from mmvid_tpu.models.mmvid import MMVIDBert
from mmvid_tpu.models.vqgan import VQGanConfig, VQGanVAE
from mmvid_tpu.parallel.mesh import make_mesh, batch_sharding, replicated


def test_generation_dp_sharded():
    assert len(jax.devices()) >= 8
    mesh = make_mesh('dp=8,tp=1')

    vq_cfg = VQGanConfig(resolution=16, ch=32, ch_mult=(1, 2),
                         num_res_blocks=1, z_channels=64, embed_dim=64,
                         n_embed=1024, attn_resolutions=())
    vae = VQGanVAE(image_size=16, cfg=vq_cfg)
    cfg = BertConfig(dim=64, num_text_tokens=100, text_seq_len=6,
                     num_visuals=0, num_targets=2, num_image_tokens=1024,
                     image_fmap_size=8, image_size=16,
                     clip=ClipStackConfig(width=64, layers=2, heads=2))
    model = MMVIDBert(cfg, vae)

    # replicate params + vae params, shard the text batch over dp
    rep = replicated(mesh)
    model.params = jax.device_put(model.params, rep)
    vae.params = jax.device_put(vae.params, rep)
    text = jax.device_put(jnp.ones((16, 6), jnp.int32),
                          batch_sharding(mesh))

    videos, seq = model.generate_images(jax.random.PRNGKey(0), text,
                                        mask_predict_steps=2, dynamic=False)
    assert seq.shape == (16, 128)
    assert videos.shape == (16, 2, 16, 16, 3)
    # the output batch stays sharded over dp — per-chip sampling
    assert len(videos.sharding.device_set) == 8
    assert np.asarray(seq).max() < 1024
