#!/usr/bin/env python3
"""VQGAN finetuning driver — the capability the reference gets from taming's
Lightning trainer (taming/models/vqgan.py:94-204): alternating
generator/discriminator steps with L1+LPIPS+hinge-GAN and the adaptive
generator weight.

Usage:
    python train_vqgan.py --image_folder data/frames --image_size 128 \
        --vae_path pretrained_models/vae_vox.ckpt --iters 10000
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--image_folder', required=True,
                   help='folder of images (recursive) or video frame tree')
    p.add_argument('--image_size', type=int, default=128)
    p.add_argument('--vae_path', type=str, default=None,
                   help='taming .ckpt to finetune from')
    p.add_argument('--vgg_path', type=str, default=None,
                   help='torchvision vgg16 state_dict for LPIPS')
    p.add_argument('--name', default='vqgan_finetune')
    p.add_argument('--log_root', default='logs')
    p.add_argument('--batch_size', type=int, default=8)
    p.add_argument('--iters', type=int, default=10000)
    p.add_argument('--learning_rate', type=float, default=4.5e-6)
    p.add_argument('--disc_start', type=int, default=0)
    p.add_argument('--disc_weight', type=float, default=0.8)
    p.add_argument('--codebook_weight', type=float, default=1.0)
    p.add_argument('--save_every_n_steps', type=int, default=2000)
    p.add_argument('--log_every', type=int, default=100)
    p.add_argument('--num_workers', type=int, default=8)
    p.add_argument('--seed', type=int, default=42)
    # architecture overrides (defaults = the shipped vqgan.1024 config)
    p.add_argument('--ch', type=int, default=128)
    p.add_argument('--ch_mult', type=str, default='1,1,2,2,4')
    p.add_argument('--num_res_blocks', type=int, default=2)
    p.add_argument('--z_channels', type=int, default=256)
    p.add_argument('--embed_dim', type=int, default=256)
    p.add_argument('--n_embed', type=int, default=1024)
    p.add_argument('--attn_resolutions', type=str, default='16')
    return p.parse_args(argv)


def main(args=None):
    args = args or parse_args()
    import jax
    import jax.numpy as jnp

    from mmvid_tpu.models.lpips import LPIPS, convert_vgg16
    from mmvid_tpu.models.vqgan import VQGanConfig
    from mmvid_tpu.models.vqgan_losses import VQGanLossConfig, VQGanTrainer
    from mmvid_tpu.utils.checkpoint import save_checkpoint

    log_dir = Path(args.log_root) / args.name
    log_dir.mkdir(parents=True, exist_ok=True)

    lpips = None
    if args.vgg_path:
        from mmvid_tpu.utils.torch_compat import load_torch_state_dict
        vgg = convert_vgg16(load_torch_state_dict(args.vgg_path, key=None))
        lpips = LPIPS(vgg_params=vgg)

    attn = tuple(int(x) for x in args.attn_resolutions.split(',') if x)
    cfg = VQGanConfig(
        resolution=args.image_size, ch=args.ch,
        ch_mult=tuple(int(x) for x in args.ch_mult.split(',')),
        num_res_blocks=args.num_res_blocks, z_channels=args.z_channels,
        embed_dim=args.embed_dim, n_embed=args.n_embed,
        attn_resolutions=attn)
    lc = VQGanLossConfig(disc_start=args.disc_start,
                         disc_weight=args.disc_weight,
                         codebook_weight=args.codebook_weight,
                         learning_rate=args.learning_rate)
    trainer = VQGanTrainer(cfg, lc, lpips=lpips)
    state = trainer.create_state(jax.random.PRNGKey(args.seed),
                                 image_size=args.image_size)
    if args.vae_path:
        from mmvid_tpu.utils.torch_compat import load_vqgan_checkpoint
        state = state.replace(g_params=load_vqgan_checkpoint(args.vae_path))

    g_step = jax.jit(trainer.make_g_step(), donate_argnums=(0,))
    d_step = jax.jit(trainer.make_d_step(), donate_argnums=(0,))

    # image stream: every image under the folder
    from mmvid_tpu.data.transforms import open_rgb, resize_exact, to_array
    paths = sorted(p for p in Path(args.image_folder).rglob('*')
                   if p.suffix.lower() in ('.png', '.jpg', '.jpeg', '.bmp'))
    assert paths, f'no images under {args.image_folder}'
    rng = np.random.RandomState(args.seed)
    print(f'{len(paths)} images found')

    def batch():
        idx = rng.randint(0, len(paths), args.batch_size)
        imgs = [to_array(resize_exact(open_rgb(paths[i]),
                                      (args.image_size, args.image_size)))
                for i in idx]
        return jnp.asarray(np.stack(imgs)) * 2.0 - 1.0  # [-1,1]

    t0 = time.time()
    for it in range(args.iters):
        x = batch()
        state, gm = g_step(state, x)
        state, dm = d_step(state, x)
        if it % args.log_every == 0:
            line = (f'iter {it} ae {float(gm["aeloss"]):.4f} '
                    f'nll {float(gm["nll"]):.4f} '
                    f'disc {float(dm["discloss"]):.4f} '
                    f'd_w {float(gm["d_weight"]):.3f} '
                    f'({time.time() - t0:.1f}s)')
            print(line)
            with open(log_dir / 'log.txt', 'a') as f:
                f.write(line + '\n')
        if it and it % args.save_every_n_steps == 0:
            save_checkpoint(str(log_dir), it,
                            {'step': it,
                             'params': jax.device_get(state.g_params)})
    save_checkpoint(str(log_dir), args.iters,
                    {'step': args.iters,
                     'params': jax.device_get(state.g_params)})
    print('vqgan finetuning done')


if __name__ == '__main__':
    main()
