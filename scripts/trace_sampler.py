"""Capture a jax.profiler device trace of the flagship sampler and print
the top LEAF device spans by time, parsed from the Chrome trace.json.gz
(the tensorboard xplane parser is protobuf-fragile in this image).
Drives the ROADMAP perf table."""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault('MMVID_PALLAS_ATTN', '1')
os.environ.setdefault('MMVID_PALLAS_SAMPLER', '1')


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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/mmvid_trace'
    model, _ = _flagship(tiny=False, dtype=jnp.bfloat16)
    if os.environ.get('MMVID_INT8') == '1':
        from mmvid_tpu.ops.int8 import quantize_for_serving
        model = quantize_for_serving(model)
    text = jnp.ones((batch, model.cfg.text_seq_len), jnp.int32)
    key = jax.random.PRNGKey(0)

    def sample(k, decode):
        v, s = model.generate_images(k, text, mask_predict_steps=20,
                                     dynamic=False, decode=decode)
        return v if decode else s

    def force(x):
        return float(jnp.sum(x.reshape(-1)[:1]))

    force(sample(key, True))  # compile both
    jax.profiler.start_trace(trace_dir)
    force(sample(jax.random.fold_in(key, 1), True))
    jax.profiler.stop_trace()

    # ---- parse: aggregate LEAF device spans from the Chrome trace ----
    # (the tensorboard xplane parser is protobuf-version-fragile in this
    # image; the trace.json.gz carries the same device lanes.  Parent
    # spans double-count their children, so keep leaves only.)
    import gzip

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
    # leaves: spans with no strictly-contained child on the same thread
    by_tid = {}
    for e in spans:
        by_tid.setdefault((e['pid'], e['tid']), []).append(e)
    totals = {}
    counts = {}
    for lane in by_tid.values():
        lane.sort(key=lambda e: (e['ts'], -e['dur']))
        for i, e in enumerate(lane):
            end = e['ts'] + e['dur']
            has_child = False
            for o in lane[i + 1:]:
                if o['ts'] >= end:
                    break
                if o['ts'] >= e['ts'] and o['ts'] + o['dur'] <= end \
                        and o is not e:
                    has_child = True
                    break
            if not has_child:
                name = e['name'][:80]
                totals[name] = totals.get(name, 0) + e['dur']
                counts[name] = counts.get(name, 0) + 1
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:25]
    grand = sum(totals.values())
    print(json.dumps({'total_device_ms': round(grand / 1e3, 1)}))
    for name, us in top:
        print(json.dumps({'op': name, 'ms': round(us / 1e3, 1),
                          'pct': round(100 * us / grand, 1),
                          'n': counts[name]}))


if __name__ == '__main__':
    main()
