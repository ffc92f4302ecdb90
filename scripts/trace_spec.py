"""Device trace of the speculative ART-V decode (MMVID_ARTV_SPEC=k) —
top leaf spans over one sample, to locate the chunk's fixed cost.
Round-4 history: the `--floor` trace of the original vmapped per-lane
design showed 24 per-chunk cache copies (~1.04 ms each) + a 4.3 ms
select fusion from the while_loop batching rule — which motivated the
manually-batched rewrite in models/artv_spec.py (floor chunk now
~1.8-1.9x a baseline token step; remaining fixed cost is the
full-width W cache reads, which cannot window because lane positions
desynchronize).

Usage: python scripts/trace_spec.py [spec_k] [batch] [trace_dir]
(sets MMVID_ARTV_SPEC/-FORCE itself; FORCE keeps every lane in
lockstep so per-chunk cost is exact).  `--floor` traces the
non-FORCE rejection path instead (random weights, acceptance ~0) —
used round 4 to explain the floor's per-chunk cost.  Parser shared
with trace_decode.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from scripts.trace_decode import print_top_leaf_spans  # noqa: E402


def main():
    argv = [a for a in sys.argv[1:] if a != '--floor']
    floor = '--floor' in sys.argv[1:]
    spec_k = int(argv[0]) if len(argv) > 0 else 8
    b = int(argv[1]) if len(argv) > 1 else 16
    trace_dir = (argv[2] if len(argv) > 2
                 else '/tmp/mmvid_spec_trace')
    os.environ['MMVID_ARTV_SPEC'] = str(spec_k)
    if not floor:
        os.environ['MMVID_ARTV_SPEC_FORCE'] = '1'  # bench-only ceiling

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update('jax_compilation_cache_dir',
                          '/tmp/mmvid_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:
        pass

    from mmvid_tpu.models.artv import ArtvConfig, ArtvModel
    from mmvid_tpu.models.clip import ClipStackConfig
    from mmvid_tpu.models.vqgan import VQGanVAE

    dtype = jnp.bfloat16
    vae = VQGanVAE(image_size=128, dtype=dtype)
    cfg = ArtvConfig(dim=768, num_text_tokens=49408, text_seq_len=50,
                     num_visuals=1, num_targets=8, num_image_tokens=1024,
                     image_fmap_size=8, image_size=128,
                     clip=ClipStackConfig(width=768, layers=12, heads=12))
    model = ArtvModel(cfg, vae, dtype=dtype)

    text = jnp.ones((b, cfg.text_seq_len), jnp.int32)
    visual = jnp.zeros((b, cfg.visual_seq_len), jnp.int32)
    key = jax.random.PRNGKey(0)

    def sample(k):
        videos, seq, steps = model.generate_images(
            k, text, visual=visual, decode=False, spec_stats=True)
        return seq, steps

    seq, steps = sample(key)                       # compile
    float(jnp.sum(seq[:1, :1]))
    t0 = time.perf_counter()
    seq, steps = sample(jax.random.fold_in(key, 1))
    float(jnp.sum(seq[:1, :1]))
    dt = time.perf_counter() - t0
    n_chunks = int(jnp.max(steps))
    print(json.dumps({'what': 'spec_sample_nodecode', 'spec': spec_k,
                      'batch': b, 'floor': floor,
                      'ms': round(dt * 1000, 1),
                      'chunks': n_chunks,
                      'ms_per_chunk': round(dt * 1000 / n_chunks, 2)}))

    jax.profiler.start_trace(trace_dir)
    seq, _ = sample(jax.random.fold_in(key, 2))
    float(jnp.sum(seq[:1, :1]))
    jax.profiler.stop_trace()
    print_top_leaf_spans(trace_dir)


if __name__ == '__main__':
    main()
