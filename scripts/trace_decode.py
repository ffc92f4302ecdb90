"""Device trace of the VQGAN decode alone (the b48 flagship sample's 384
frames) — top leaf spans, to find where the ~19% decode share of sampling
device time goes.  Parser shared with trace_sampler.py."""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def print_top_leaf_spans(trace_dir, top_n=25):
    files = sorted(glob.glob(
        os.path.join(trace_dir, '**', '*.trace.json.gz'), recursive=True))
    if not files:
        print('no trace.json.gz found under', trace_dir)
        return
    with gzip.open(files[-1], 'rt') as f:
        events = json.load(f).get('traceEvents', [])
    device_pids = {e['pid'] for e in events
                   if e.get('ph') == 'M' and e.get('name') == 'process_name'
                   and 'TPU' in str(e.get('args', {}).get('name', ''))}
    spans = [e for e in events
             if e.get('ph') == 'X' and e.get('pid') in device_pids
             and e.get('dur', 0) > 0]
    by_tid = {}
    for e in spans:
        by_tid.setdefault((e['pid'], e['tid']), []).append(e)
    totals, counts = {}, {}

    def emit(rec):
        if not rec[2]:  # leaf: no nested span was pushed under it
            name = rec[1][:90]
            totals[name] = totals.get(name, 0) + rec[3]
            counts[name] = counts.get(name, 0) + 1

    # O(n) nesting-stack sweep (spans within a tid nest properly); the
    # previous per-span forward scan was quadratic and took hours on
    # long while_loop traces (511-iteration spec-decode floor run).
    for lane in by_tid.values():
        lane.sort(key=lambda e: (e['ts'], -e['dur']))
        stack = []  # [end_ts, name, has_child, dur]
        for e in lane:
            ts = e['ts']
            while stack and stack[-1][0] <= ts:
                emit(stack.pop())
            if stack:
                stack[-1][2] = True
            stack.append([ts + e['dur'], e['name'], False, e['dur']])
        while stack:
            emit(stack.pop())
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]
    grand = sum(totals.values())
    print(json.dumps({'total_device_ms': round(grand / 1e3, 1)}))
    for name, us in top:
        print(json.dumps({'op': name, 'ms': round(us / 1e3, 1),
                          'pct': round(100 * us / grand, 1),
                          'n': counts[name]}))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update('jax_compilation_cache_dir',
                          '/tmp/mmvid_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:
        pass

    from mmvid_tpu.models.vqgan import VQGanVAE

    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/mmvid_dec_trace'
    vae = VQGanVAE(image_size=128, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    seq = jax.random.randint(key, (frames, 64), 0, 1024)

    @jax.jit
    def dec(p, s):
        return vae._decode_impl(p, s)

    def force(x):
        return float(jnp.sum(x.reshape(-1)[:1]))

    force(dec(vae.params, seq))
    import time
    t0 = time.perf_counter()
    for _ in range(3):
        force(dec(vae.params, seq))
    dt = (time.perf_counter() - t0) / 3
    print(json.dumps({'what': 'decode_wall', 'frames': frames,
                      'ms': round(dt * 1000, 1)}))
    jax.profiler.start_trace(trace_dir)
    force(dec(vae.params, seq))
    jax.profiler.stop_trace()
    print_top_leaf_spans(trace_dir)


if __name__ == '__main__':
    main()
