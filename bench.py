"""Benchmark: flagship text-to-video sampling throughput (frames/sec/chip).

Measures the BASELINE.json headline — 8-frame 128x128 video sampling with the
full-size model (ViT-B/32-visual-width 768x12L backbone over the 565-token
sequence, 20 mask-predict steps, VQGAN decode) — on the available device.

Baseline: the reference samples ONE item at a time (dalle_bert.py:618) with
20 sequential full-sequence forwards + per-frame VQGAN decodes; measured
reference throughput on A100 is not published, so ``vs_baseline`` divides by
a 30 frames/sec/GPU estimate derived two independent ways in BASELINE.md
("Derivation of the 30 frames/sec/A100 reference-sampler estimate"):
A100 eager batch-1 latency (30-42 f/s) and a host-CPU measurement of the
reference forward (0.305 f/s measured x ~100x A100/CPU-core ratio).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_FRAMES_PER_SEC = 30.0  # derived in BASELINE.md, not a bare constant


def main():
    import os
    # layout-preserving fused attention kernel (mmvid_tpu.ops.attention):
    # 255 -> 336 frames/sec/chip measured on v5e
    os.environ.setdefault('MMVID_PALLAS_ATTN', '1')
    # fused to_logits + Gumbel sampling epilogue (mmvid_tpu.ops.sample_head):
    # 367 -> 378 f/s on top of the seq-576 padding (validated on HW by
    # scripts/check_sample_head_tpu.py)
    os.environ.setdefault('MMVID_PALLAS_SAMPLER', '1')

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: repeat bench invocations skip the
    # ~5 min XLA compile of the full sampling program
    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                         '/tmp/mmvid_jax_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:
        pass

    from __graft_entry__ import _flagship

    # throughput sweet spot measured on v5e: b16 378, b24 377, b32 394,
    # b48 404, b64 403 f/s/chip
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    steps = 20

    model, vae = _flagship(tiny=False, dtype=jnp.bfloat16)
    if os.environ.get('MMVID_INT8') == '1':
        # opt-in w8a8 serving quantization (+8% measured, ops/int8.py);
        # default stays bf16 so the headline number is the quality-parity
        # path
        from mmvid_tpu.ops.int8 import quantize_for_serving
        model = quantize_for_serving(model)
    cfg = model.cfg

    text = jnp.ones((batch, cfg.text_seq_len), jnp.int32)
    key = jax.random.PRNGKey(0)

    def sample(k):
        videos, seq = model.generate_images(
            k, text, mask_predict_steps=steps, dynamic=False)
        return videos

    def force(x):
        # On the tunneled TPU platform block_until_ready returns without
        # blocking; a scalar readback forces execution with ~no transfer.
        return float(jnp.sum(x[0, 0, 0, 0]))

    # warmup/compile
    videos = sample(key)
    force(videos)

    # Steady-state pipelined throughput (what generate.py's one-batch
    # pipelining achieves): dispatch every batch back-to-back and force
    # only the last — the host<->device round trip per batch (a tunnel
    # RPC here) overlaps with device compute instead of serializing it.
    # MMVID_BENCH_SYNC=1 restores the old force-per-batch timing.
    sync = os.environ.get('MMVID_BENCH_SYNC') == '1'
    n_iters = 3
    t0 = time.perf_counter()
    for i in range(n_iters):
        videos = sample(jax.random.fold_in(key, i))
        if sync:
            force(videos)
    if not sync:
        force(videos)
    dt = (time.perf_counter() - t0) / n_iters

    frames = batch * cfg.num_targets
    fps = frames / dt
    n_chips = max(len(jax.devices()), 1)
    fps_chip = fps / n_chips

    print(json.dumps({
        'metric': 'sampling_throughput_8x128x128',
        'value': round(fps_chip, 2),
        'unit': 'frames/sec/chip',
        'vs_baseline': round(fps_chip / BASELINE_FRAMES_PER_SEC, 2),
    }), flush=True)


if __name__ == '__main__':
    main()
