"""Decode-path timing: full-size VQGAN decode of 384 frames (the b48
flagship sample's decode load).  Finding recorded in ROADMAP.md: decode is
conv-bound — a bf16-GroupNorm-output variant was bitwise identical and a
perf wash (XLA already fuses the fp32-GN->bf16-conv cast), so no flag."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run(tag, frames=384):
    import jax
    import jax.numpy as jnp

    from mmvid_tpu.models.vqgan import VQGanVAE

    vae = VQGanVAE(image_size=128, dtype=jnp.bfloat16)
    seq = jnp.zeros((frames, 64), jnp.int32)

    @jax.jit
    def dec(p, s):
        return vae._decode_impl(p, s)

    def force(x):
        return float(jnp.sum(x.reshape(-1)[:1]))

    force(dec(vae.params, seq))
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        force(dec(vae.params, seq))
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({'what': f'decode_{tag}', 'frames': frames,
                      'ms': round(dt * 1000, 1),
                      'frames_s': round(frames / dt, 1)}), flush=True)


def main():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir',
                          '/tmp/mmvid_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:
        pass
    run('bf16')


if __name__ == '__main__':
    main()
