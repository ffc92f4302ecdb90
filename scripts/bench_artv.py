"""ART-V (autoregressive baseline) sampling throughput on the current
device: KV-cached decode of 512 target tokens + VQGAN decode, flagship
size (768x12L, 8x128x128, visual control 1 frame).

The reference pays a full O(L^2) forward per generated token with no KV
cache and re-tokenizes the visual every step (dalle_artv.py:258-281);
here prefill runs once and a lax.scan decodes against per-layer caches.
Prints one JSON line per batch size; results recorded in ROADMAP.md.

Speculative decode (models/artv_spec.py): `--spec K` verifies K
copy-previous-frame drafts per chunk forward and reports the realised
acceptance (tokens committed per chunk) alongside throughput.  `--force`
additionally sets MMVID_ARTV_SPEC_FORCE=1 — the bench-only CEILING run
(all drafts accepted, output garbage by design); without it, random init
weights measure the FLOOR (acceptance ~1/k_img, i.e. chunk overhead).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    argv = sys.argv[1:]
    spec = 0
    if '--spec' in argv:
        i = argv.index('--spec')
        spec = int(argv[i + 1])
        del argv[i:i + 2]
        os.environ['MMVID_ARTV_SPEC'] = str(spec)
    if '--force' in argv:
        argv.remove('--force')
        os.environ['MMVID_ARTV_SPEC_FORCE'] = '1'

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

    int8 = '--int8' in argv
    argv = [a for a in argv if a != '--int8']
    batches = [int(b) for b in argv] or [16, 48]
    dtype = jnp.bfloat16
    vae = VQGanVAE(image_size=128, dtype=dtype)
    cfg = ArtvConfig(dim=768, num_text_tokens=49408, text_seq_len=50,
                     num_visuals=1, num_targets=8, num_image_tokens=1024,
                     image_fmap_size=8, image_size=128,
                     clip=ClipStackConfig(width=768, layers=12, heads=12))
    model = ArtvModel(cfg, vae, dtype=dtype)

    def force(x):
        return float(jnp.sum(x.reshape(-1)[:1]))

    import numpy as np

    for b in batches:
        text = jnp.ones((b, cfg.text_seq_len), jnp.int32)
        visual = jnp.zeros((b, cfg.visual_seq_len), jnp.int32)
        key = jax.random.PRNGKey(0)

        def sample(k):
            if spec:
                videos, seq, steps = model.generate_images(
                    k, text, visual=visual, int8=int8, spec_stats=True)
                return videos, steps
            videos, seq = model.generate_images(k, text, visual=visual,
                                                int8=int8)
            return videos, None

        _, steps = sample(key)  # compile
        force(_)
        iters = 3
        t0 = time.perf_counter()
        for i in range(iters):
            vids, steps = sample(jax.random.fold_in(key, i))
            force(vids)
        dt = (time.perf_counter() - t0) / iters
        rec = {
            'what': 'artv_sample', 'batch': b, 'int8': int8,
            'ms': round(dt * 1000, 1),
            'frames_s': round(b * cfg.num_targets / dt, 1),
            'tokens_s': round(b * cfg.target_seq_len / dt, 1)}
        if spec:
            # realised speculation gain: loop tokens per chunk forward
            # (1.0 = no drafts accepted; spec+1 = all accepted)
            tpc = (cfg.target_seq_len - 1) / np.maximum(
                np.asarray(steps), 1)
            rec.update(spec=spec,
                       force=os.environ.get(
                           'MMVID_ARTV_SPEC_FORCE') == '1',
                       tokens_per_chunk=round(float(tpc.mean()), 2))
        print(json.dumps(rec), flush=True)


if __name__ == '__main__':
    main()
