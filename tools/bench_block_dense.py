"""Decision bench for ops/block_dense.py (VERDICT r3 #9 / r4 weak #7).

block_dense's stated win condition is DENSIFIED occupancy — multi-sweep
frames (~110k voxels at the waymo_multi_sweeps caps). This times a stage's
worth of submanifold convs through (a) the production planar sorted-order
engine and (b) the block-dense engine (scatter once, halo-refresh + dense
MXU conv per conv, gather once) on exactly that workload, single chip.

  python tools/bench_block_dense.py [--n_convs 2] [--channels 48]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n_convs', type=int, default=2)
    ap.add_argument('--channels', type=int, default=48)
    ap.add_argument('--block_size', type=int, default=8)
    ap.add_argument('--iters', type=int, default=20)
    args = ap.parse_args()

    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)

    from openseg3d_tpu.config import cfg_from_file
    from openseg3d_tpu.core.voxelizer import VoxelGenerator
    from openseg3d_tpu.ops.sparse_conv import (SparseTensor,
                                               build_planar_k3_direct,
                                               apply_subm)
    from openseg3d_tpu.ops.block_dense import (build_block_layout,
                                               scatter_to_blocks,
                                               refresh_halos, dense_subm_conv,
                                               pad_interior, gather_from_blocks)
    from bench import make_waymo_like_cloud

    cfg = cfg_from_file('configs/waymo_multi_sweeps.yaml')
    v_cap = int(cfg.RUNTIME.MAX_VOXELS_PER_SAMPLE)
    rng = np.random.RandomState(0)
    vg = VoxelGenerator(cfg.DATASET.VOXEL_SIZE, cfg.DATASET.POINT_CLOUD_RANGE)
    n_cur = 180224 // cfg.DATASET.NUM_SWEEPS
    sweeps = []
    for si in range(cfg.DATASET.NUM_SWEEPS):
        sw = make_waymo_like_cloud(rng, n_cur)
        sw[:, :2] += 0.4 * si
        sweeps.append(sw)
    pts = np.concatenate(sweeps)
    coords, _ = vg.generate(pts)
    n_vox = coords.shape[0]
    pad = np.full((max(v_cap - n_vox, 0), 3), -1, np.int32)
    coords = np.concatenate([coords[:v_cap], pad])[None]     # [1, Vcap, 3]
    gx, gy, gz = (np.round((np.array(cfg.DATASET.POINT_CLOUD_RANGE[3:])
                            - np.array(cfg.DATASET.POINT_CLOUD_RANGE[:3]))
                  / np.array(cfg.DATASET.VOXEL_SIZE))).astype(int)
    spatial_shape = (int(gz), int(gy), int(gx))
    print(f'multi-sweep occupancy: {n_vox} voxels (cap {v_cap}), '
          f'grid {spatial_shape}', flush=True)

    c = args.channels
    bs3 = (args.block_size,) * 3
    x = jnp.asarray(rng.randn(1, v_cap, c), jnp.bfloat16)
    # voxelizer output is key-sorted (the planar-path pipeline invariant)
    st = SparseTensor(features=x, coords=jnp.asarray(coords),
                      spatial_shape=spatial_shape)
    mask = jnp.asarray(coords[..., 0] >= 0)
    ws = [jnp.asarray(rng.randn(27, c, c) * 0.05, jnp.bfloat16)
          for _ in range(args.n_convs)]

    @jax.jit
    def planar(x, ws):
        rb = build_planar_k3_direct(st)
        y = x
        for w in ws:
            y = apply_subm(y, rb, w, mask, compute_dtype=jnp.bfloat16)
        return y

    # block-dense nb_cap: blocks at ~30-45% fill of a 1440^2x64/8^3 grid
    nb_cap = 8192

    @jax.jit
    def block(x, ws):
        layout = build_block_layout(st.coords, spatial_shape, bs3, nb_cap)
        dense = scatter_to_blocks(x, layout, bs3)
        for w in ws:
            dense = refresh_halos(dense, layout)
            y = dense_subm_conv(dense, w, compute_dtype=jnp.bfloat16)
            dense = pad_interior(y.astype(x.dtype))
        return gather_from_blocks(dense, layout)

    _ = float(jax.jit(lambda: jnp.zeros(()))()[...])

    def bench(f, label):
        t0 = time.time()
        o = f(x, ws)
        _ = float(jnp.asarray(o[0, 0, 0], jnp.float32))
        compile_s = time.time() - t0
        t0 = time.time()
        for _i in range(args.iters):
            o = f(x, ws)
        _ = float(jnp.asarray(o[0, 0, 0], jnp.float32))
        ms = (time.time() - t0) / args.iters * 1e3
        print(f'{label}: {ms:.2f} ms/{args.n_convs}-conv chain '
              f'(compile {compile_s:.0f}s)', flush=True)
        return ms

    p = bench(planar, f'planar  C={c}')
    b = bench(block, f'blockdn C={c}')
    print(f'RESULT: planar {p:.2f} ms vs block_dense {b:.2f} ms '
          f'({"block WINS" if b < p else "planar wins"}) at {n_vox} voxels',
          flush=True)


if __name__ == '__main__':
    main()
