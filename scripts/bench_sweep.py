"""Throughput sweep over kernel-flag variants and batch sizes (real TPU).

Each variant rebuilds the flagship model so the generation cache retraces
under the new env flags.  Prints one line per variant; used to pick the
bench.py defaults (results recorded in ROADMAP.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_variant(name, batch, env, steps=20, iters=3):
    for k in ('MMVID_PALLAS_ATTN', 'MMVID_PALLAS_SAMPLER', 'MMVID_FAST_LN',
              'MMVID_FUSED_LNQKV', 'MMVID_ATTN_BF16', 'MMVID_ATTN_HPB',
              'MMVID_ATTN_QB', 'MMVID_ATTN_INT8', 'MMVID_INT8',
              'MMVID_TOKEN_WARP', 'MMVID_ARTV_WINDOW', 'MMVID_ARTV_FUSED',
              'MMVID_ARTV_FLAT', 'MMVID_ARTV_INT8_WEIGHTS_ONLY',
              'MMVID_ARTV_SPEC', 'MMVID_ARTV_SPEC_FORCE'):
        os.environ.pop(k, None)
    os.environ.update(env)

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    model, _ = _flagship(tiny=False, dtype=jnp.bfloat16)
    if env.get('MMVID_INT8') == '1':
        from mmvid_tpu.ops.int8 import quantize_for_serving
        model = quantize_for_serving(model)
    cfg = model.cfg
    text = jnp.ones((batch, cfg.text_seq_len), jnp.int32)
    key = jax.random.PRNGKey(0)

    def sample(k, decode=True):
        videos, seq = model.generate_images(
            k, text, mask_predict_steps=steps, dynamic=False, decode=decode)
        return videos if decode else seq

    def force(x):
        return float(jnp.sum(x.reshape(-1)[:1]))

    force(sample(key))  # compile
    t0 = time.perf_counter()
    for i in range(iters):
        force(sample(jax.random.fold_in(key, i)))
    dt = (time.perf_counter() - t0) / iters
    fps = batch * cfg.num_targets / dt
    print(json.dumps({'variant': name, 'batch': batch,
                      'fps_chip': round(fps, 1),
                      'ms_per_call': round(dt * 1000, 1)}), flush=True)
    return fps


def main():
    jax_cache = os.environ.get('JAX_COMPILATION_CACHE_DIR',
                               '/tmp/mmvid_jax_cache')
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', jax_cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:
        pass

    base = {'MMVID_PALLAS_ATTN': '1', 'MMVID_PALLAS_SAMPLER': '1'}
    which = sys.argv[1:] or ['base48']
    variants = {
        'base48': ('baseline b48', 48, base),
        'base96': ('batch 96', 96, base),
        'base64': ('batch 64', 64, base),
        'fastln48': ('fast-LN b48', 48, {**base, 'MMVID_FAST_LN': '1'}),
        'lnqkv48': ('fused LN+QKV b48', 48,
                    {**base, 'MMVID_FUSED_LNQKV': '1'}),
        'noattn48': ('xla attention b48', 48,
                     {'MMVID_PALLAS_SAMPLER': '1'}),
        'attnbf16_48': ('bf16 AV attention b48', 48,
                        {**base, 'MMVID_ATTN_BF16': '1'}),
        'hpb4_48': ('4 heads/program b48', 48,
                    {**base, 'MMVID_ATTN_HPB': '4'}),
        'hpb6_48': ('6 heads/program b48', 48,
                    {**base, 'MMVID_ATTN_HPB': '6'}),
        'hpb12_48': ('12 heads/program b48', 48,
                     {**base, 'MMVID_ATTN_HPB': '12'}),
        'int8_48': ('w8a8 int8 backbone b48', 48,
                    {**base, 'MMVID_INT8': '1'}),
        'int8_16': ('w8a8 int8 backbone b16', 16,
                    {**base, 'MMVID_INT8': '1'}),
        'int8_64': ('w8a8 int8 backbone b64', 64,
                    {**base, 'MMVID_INT8': '1'}),
        'int8_96': ('w8a8 int8 backbone b96', 96,
                    {**base, 'MMVID_INT8': '1'}),
        'int8fastln_48': ('int8 + bf16 LN b48', 48,
                          {**base, 'MMVID_INT8': '1',
                           'MMVID_FAST_LN': '1'}),
        'int8qb96_64': ('int8 + q-block 96 b64', 64,
                        {**base, 'MMVID_INT8': '1',
                         'MMVID_ATTN_QB': '96'}),
        'int8qb192_64': ('int8 + q-block 192 b64', 64,
                         {**base, 'MMVID_INT8': '1',
                          'MMVID_ATTN_QB': '192'}),
    }
    for w in which:
        name, batch, env = variants[w]
        run_variant(name, batch, env)


if __name__ == '__main__':
    main()
