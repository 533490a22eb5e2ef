"""Profile train/eval steps on device and attribute time to XLA ops.

Fills the reference's tracing gap (SURVEY.md §5: only a dead Timer class,
seg3d/utils/timer.py): traces N jitted steps with jax.profiler (which works
through the axon TPU tunnel) and aggregates device op durations from the
xplane protobuf via tensorflow's tsl parser.

  python tools/profile.py --mode train --n_points 163840 --steps 2
  python tools/profile.py --mode infer --trace_dir /tmp/xplane_out
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _parse_hlo_metadata(hlo_path: str) -> dict:
    """Optimized-HLO text -> {op result name: (op_name path, file:line)}.
    Produced by `jit_fn.lower(...).compile().as_text()` (see --dump_hlo)."""
    import re
    meta = {}
    pat = re.compile(r'%([\w.\-]+) = .*?metadata=\{op_name="([^"]*)"'
                     r'(?: source_file="([^"]*)" source_line=(\d+))?')
    with open(hlo_path) as fh:
        for line in fh:
            m = pat.search(line)
            if m:
                name, op, sf, sl = m.groups()
                meta[name] = (op, f'{sf.split("/")[-1]}:{sl}' if sf else '')
    return meta


def analyze(trace_dir: str, top: int = 30, hlo_path: str = '',
            fallback_steps: int = 0) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(trace_dir + '/**/*.xplane.pb', recursive=True)
    agg, cnt = defaultdict(float), defaultdict(int)
    total = async_total = 0.0
    n_steps = 0
    for f in files:
        xs = xplane_pb2.XSpace()
        with open(f, 'rb') as fh:
            xs.ParseFromString(fh.read())
        for plane in xs.planes:
            if 'TPU' not in plane.name or 'host' in plane.name.lower():
                continue
            ev_names = {i: m.name for i, m in plane.event_metadata.items()}
            for line in plane.lines:
                # ONLY the 'XLA Ops' line is additive serial device time (its
                # sum matches the wall step time exactly). 'Async XLA Ops'
                # holds in-flight DMA durations that OVERLAP compute, and
                # 'XLA Modules'/'Steps' are containers — summing any of them
                # in quadruples the totals (observed 7.5s "per step" vs the
                # real 1.15s).
                if line.name == 'Steps':
                    n_steps += len(line.events)
                if line.name == 'Async XLA Ops':
                    async_total += sum(ev.duration_ps / 1e9
                                       for ev in line.events)
                if line.name != 'XLA Ops':
                    continue
                for ev in line.events:
                    name = ev_names.get(ev.metadata_id, '?')
                    # container/bookkeeping events, not ops
                    if name.startswith('jit_') or 'Trace Buffers' in name:
                        continue
                    dur = ev.duration_ps / 1e9          # ms
                    agg[name] += dur
                    cnt[name] += 1
                    total += dur

    def bucket(name):
        n = name.lower()
        for key in ('fusion', 'dynamic-slice', 'dynamic-update', 'gather',
                    'scatter', 'sort', 'convolution', 'dot', 'custom-call',
                    'copy', 'reduce', 'while', 'all-'):
            if key in n:
                return key
        return 'other'

    bagg = defaultdict(float)
    for k, v in agg.items():
        bagg[bucket(k)] += v
    # some traces carry no 'Steps' line (un-annotated jit loops); fall back to
    # the step count the caller actually ran
    steps = max(n_steps, fallback_steps, 1)
    print(f'total attributed device ms: {total:.1f} over {n_steps} steps '
          f'= {total / steps:.1f} ms/step '
          f'(async DMA in flight, overlapped: {async_total / steps:.1f} ms/step)')
    print('== by bucket ==')
    for k, v in sorted(bagg.items(), key=lambda x: -x[1]):
        print(f'  {k:22s} {v:10.1f} ms')
    print(f'== top {top} ops ==')
    for k, v in sorted(agg.items(), key=lambda x: -x[1])[:top]:
        print(f'  {v:9.1f} ms x{cnt[k]:4d}  {k[:110]}')

    if hlo_path:
        # join op timings onto HLO op_name provenance -> per-module/source
        # attribution (the shape-only view above can't tell a decoder conv
        # from an encoder one)
        import re
        meta = _parse_hlo_metadata(hlo_path)
        magg = defaultdict(float)
        for k, v in agg.items():
            base = k.split(' ')[0].lstrip('%')
            op, loc = meta.get(base, ('?unmatched', ''))
            op = re.sub(r'^jit\([\w_]+\)/', '', op)
            op = re.sub(r'jvp\((\w+)\)/', '', op)
            op = re.sub(r'transpose\(', 'bwd(', op)
            magg[('/'.join(op.split('/')[:4]), loc)] += v
        print('== by module/source (ms/step, needs --hlo of the SAME build) ==')
        for (lead, loc), v in sorted(magg.items(), key=lambda x: -x[1])[:40]:
            print(f'  {v / steps:8.2f}  {lead[:95]}  [{loc}]')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--mode', choices=['infer', 'train'], default='train')
    ap.add_argument('--n_points', type=int, default=163840)
    ap.add_argument('--max_voxels', type=int, default=98304)
    ap.add_argument('--steps', type=int, default=2)
    ap.add_argument('--segmentor', default='segformer')
    ap.add_argument('--trace_dir', default='/tmp/openseg3d_xplane')
    ap.add_argument('--top', type=int, default=30)
    ap.add_argument('--analyze_only', action='store_true',
                    help='just re-parse an existing trace directory')
    ap.add_argument('--hlo', default='',
                    help='optimized-HLO text of the traced executable; joins '
                         'op timings onto op_name/source provenance')
    ap.add_argument('--dump_hlo', default='',
                    help='write the optimized HLO of the profiled step here '
                         '(and use it for the provenance join)')
    ap.add_argument('--image_feature', action='store_true',
                    help='enable DATASET.USE_IMAGE_FEATURE (DeepFusion)')
    args = ap.parse_args()

    if args.analyze_only:
        analyze(args.trace_dir, top=args.top, hlo_path=args.hlo, fallback_steps=args.steps)
        return

    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)

    from openseg3d_tpu.config import cfg_from_file
    from openseg3d_tpu.core.voxelizer import VoxelGenerator, majority_voxel_labels
    from openseg3d_tpu.data.batch import pad_sample, collate_padded
    from openseg3d_tpu.engine import (build_segmentor, create_train_state,
                                      make_train_step)
    from openseg3d_tpu.models.optim import build_optimizer, build_schedule
    from bench import make_waymo_like_cloud

    overrides = {
        'MODEL': {'SEGMENTOR': args.segmentor},
        'RUNTIME': {'MAX_POINTS_PER_SAMPLE': args.n_points,
                    'MAX_VOXELS_PER_SAMPLE': args.max_voxels},
    }
    if args.image_feature:
        overrides['DATASET'] = {'USE_IMAGE_FEATURE': True}
    cfg = cfg_from_file('configs/waymo_one_sweep.yaml', overrides=overrides)
    rng = np.random.RandomState(0)
    vg = VoxelGenerator(cfg.DATASET.VOXEL_SIZE, cfg.DATASET.POINT_CLOUD_RANGE)
    pts = make_waymo_like_cloud(rng, args.n_points)
    coords, ids = vg.generate(pts)
    labels = rng.randint(0, 22, args.n_points)
    s = dict(points=pts, voxel_coords=coords, point_voxel_ids=ids,
             point_labels=labels,
             voxel_labels=majority_voxel_labels(ids, labels, coords.shape[0]))
    if args.image_feature:
        s['point_image_features'] = rng.randn(
            args.n_points, cfg.DATASET.DIM_IMAGE_FEATURE).astype(np.float32)
    batch = collate_padded([pad_sample(s, args.n_points, args.max_voxels)])
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != 'batch_size'}

    model, spec = build_segmentor(cfg)
    tx = build_optimizer(cfg, build_schedule(cfg, 30, 1000))
    state = create_train_state(cfg, model, tx, batch, seed=0)
    key = jax.random.PRNGKey(0)

    if args.mode == 'train':
        step = make_train_step(cfg, spec, model, donate=False)
        run = lambda st: step(st, batch, key)
        sync = lambda out: float(out[1]['loss'])
        if args.dump_hlo:
            txt = step.lower(state, batch, key).compile().as_text()
            open(args.dump_hlo, 'w').write(txt)
            args.hlo = args.dump_hlo
    else:
        variables = {'params': state.params, 'batch_stats': state.batch_stats}
        fwd = jax.jit(lambda b: model.apply(variables, b, train=False)['point_out'])
        run = lambda st: (st, fwd(batch))
        sync = lambda out: float(out[1][0, 0, 0])
        if args.dump_hlo:
            txt = fwd.lower(batch).compile().as_text()
            open(args.dump_hlo, 'w').write(txt)
            args.hlo = args.dump_hlo

    t0 = time.time()
    out = run(state)
    _ = sync(out)
    print(f'compile+1st: {time.time() - t0:.1f}s', flush=True)

    t0 = time.time()
    with jax.profiler.trace(args.trace_dir):
        st = state
        for _ in range(args.steps):
            out = run(st)
            st = out[0]
        _ = sync(out)
    wall = time.time() - t0
    print(f'{args.steps} traced steps: {wall:.1f}s '
          f'(tracing inflates wall time; use op attribution below)', flush=True)
    analyze(args.trace_dir, hlo_path=args.hlo, fallback_steps=args.steps)


if __name__ == '__main__':
    main()
