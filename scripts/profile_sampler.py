"""Per-component timing of the flagship sampler on real hardware.

Breaks the ~400 f/s wall into parts: full sample vs decode-free sample
(VQGAN decode share), a single backbone forward (per-step cost), and the
attention kernel in fp32-upcast vs bf16-MXU variants.  Results feed
ROADMAP.md's measured-perf table.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault('MMVID_PALLAS_ATTN', '1')
os.environ.setdefault('MMVID_PALLAS_SAMPLER', '1')


def timeit(fn, *args, iters=5):
    import jax.numpy as jnp

    def force(x):
        leaf = [l for l in __import__('jax').tree_util.tree_leaves(x)
                if hasattr(l, 'reshape')][0]
        return float(jnp.sum(leaf.reshape(-1)[:1]))

    force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        force(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update('jax_compilation_cache_dir',
                          '/tmp/mmvid_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:
        pass

    from __graft_entry__ import _flagship
    from mmvid_tpu.models.bert import BertCore

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    model, vae = _flagship(tiny=False, dtype=jnp.bfloat16)
    cfg = model.cfg
    text = jnp.ones((batch, cfg.text_seq_len), jnp.int32)
    key = jax.random.PRNGKey(0)

    # 1) full sample vs decode-free
    def sample(k, decode):
        v, s = model.generate_images(k, text, mask_predict_steps=20,
                                     dynamic=False, decode=decode)
        return v if decode else s

    t_full = timeit(lambda k: sample(k, True), key, iters=3)
    t_nodec = timeit(lambda k: sample(k, False), key, iters=3)
    print(json.dumps({'what': 'sample_full_ms', 'batch': batch,
                      'ms': round(t_full * 1000, 1),
                      'fps': round(batch * 8 / t_full, 1)}), flush=True)
    print(json.dumps({'what': 'sample_nodecode_ms', 'batch': batch,
                      'ms': round(t_nodec * 1000, 1),
                      'decode_share_pct': round(
                          100 * (t_full - t_nodec) / t_full, 1)}),
          flush=True)

    # 2) one full-sequence forward (the unit the 21-step loop repeats)
    params = model.params
    target = jnp.zeros((batch, cfg.target_seq_len), jnp.int32)

    @jax.jit
    def one_forward(p, txt, tgt):
        control = model.core.apply({'params': p}, txt, None,
                                   method=BertCore.control_embedding)
        temb = model.core.apply({'params': p}, tgt,
                                method=BertCore.target_embedding)
        return model.core.apply({'params': p}, control, temb,
                                method=BertCore.forward_hidden)

    t_fwd = timeit(one_forward, params, text, target, iters=10)
    flops = batch * 576 * (2 * 85e6) + batch * 2 * 576 * 576 * 768 * 2 * 12
    print(json.dumps({'what': 'one_forward_ms', 'batch': batch,
                      'ms': round(t_fwd * 1000, 2),
                      'tflops_s': round(flops / t_fwd / 1e12, 1),
                      'loop21_ms': round(21 * t_fwd * 1000, 1)}), flush=True)

    # 3) attention kernel dtype variants
    from mmvid_tpu.ops.attention import fused_attention_blhd
    b, l, h, d = batch, 576, 12, 64
    q = jax.random.normal(key, (b, l, h, d), jnp.bfloat16)
    k_ = jax.random.normal(key, (b, l, h, d), jnp.bfloat16)
    v = jax.random.normal(key, (b, l, h, d), jnp.bfloat16)
    mask = jnp.zeros((l, l), jnp.float32)

    t_attn = timeit(jax.jit(fused_attention_blhd), q, k_, v, mask, iters=10)
    print(json.dumps({'what': 'attn_kernel_ms', 'batch': batch,
                      'ms': round(t_attn * 1000, 2),
                      'x12_ms': round(12 * t_attn * 1000, 2)}), flush=True)


if __name__ == '__main__':
    main()
