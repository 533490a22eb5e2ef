"""Dense-block subm conv vs the gather-GEMM engine (must agree exactly),
including halo refresh across chained convs."""

import jax
import jax.numpy as jnp
import numpy as np

from openseg3d_tpu.ops.sparse_conv import (SparseTensor, build_subm_rulebook,
                                           apply_sparse_conv)
from openseg3d_tpu.ops.block_dense import (build_block_layout, scatter_to_blocks,
                                           gather_from_blocks, refresh_halos,
                                           dense_subm_conv, pad_interior,
                                           block_subm_conv)


def _scene(seed, b=2, v_cap=64, n=48, shape=(12, 12, 12), c=5):
    rng = np.random.RandomState(seed)
    coords = np.full((b, v_cap, 3), -1, np.int32)
    feats = np.zeros((b, v_cap, c), np.float32)
    for i in range(b):
        lin = rng.choice(shape[0] * shape[1] * shape[2], n, replace=False)
        coords[i, :n] = np.stack([lin // (shape[1] * shape[2]),
                                  (lin // shape[2]) % shape[1],
                                  lin % shape[2]], 1)
        feats[i, :n] = rng.randn(n, c)
    return jnp.asarray(feats), jnp.asarray(coords), shape


def test_one_conv_matches_gather_engine():
    feats, coords, shape = _scene(0)
    st = SparseTensor(features=feats, coords=coords, spatial_shape=shape)
    rb = jax.jit(build_subm_rulebook, static_argnums=1)(st, 3)
    w = jnp.asarray(np.random.RandomState(1).randn(27, 5, 7).astype(np.float32))
    ref = jax.jit(apply_sparse_conv)(feats, rb, w, st.mask)

    layout = jax.jit(lambda c: build_block_layout(c, shape, (4, 4, 4), 64))(coords)
    got = jax.jit(lambda f, w: block_subm_conv(f, layout, w, (4, 4, 4)))(feats, w)
    np.testing.assert_allclose(np.array(got), np.array(ref), rtol=1e-4, atol=1e-4)


def test_chained_convs_with_halo_refresh():
    """Two convs back-to-back in dense layout (halo refresh between) must
    equal two gather-engine convs."""
    feats, coords, shape = _scene(2, c=6)
    st = SparseTensor(features=feats, coords=coords, spatial_shape=shape)
    rb = jax.jit(build_subm_rulebook, static_argnums=1)(st, 3)
    rng = np.random.RandomState(3)
    w1 = jnp.asarray(rng.randn(27, 6, 8).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.randn(27, 8, 4).astype(np.float32) * 0.2)

    def ref_fn(f):
        h = apply_sparse_conv(f, rb, w1, st.mask)
        h = jnp.tanh(h)
        return apply_sparse_conv(h, rb, w2, st.mask)

    layout = jax.jit(lambda c: build_block_layout(c, shape, (4, 4, 4), 64))(coords)

    def blk_fn(f):
        # occupancy mask in dense layout: only real sites may carry values
        occ = scatter_to_blocks(jnp.ones_like(f[..., :1]), layout, (4, 4, 4))
        d = scatter_to_blocks(f, layout, (4, 4, 4))
        d = refresh_halos(d, layout)
        y = dense_subm_conv(d, w1)
        y = jnp.tanh(y) * occ[:, :, 1:-1, 1:-1, 1:-1]   # mask to input sites
        d = refresh_halos(pad_interior(y), layout)
        y = dense_subm_conv(d, w2)
        return gather_from_blocks(pad_interior(y), layout)

    ref = jax.jit(ref_fn)(feats)
    got = jax.jit(blk_fn)(feats)
    np.testing.assert_allclose(np.array(got), np.array(ref), rtol=1e-4, atol=1e-4)


def test_layout_reports_true_block_count():
    feats, coords, shape = _scene(4)
    layout = jax.jit(lambda c: build_block_layout(c, shape, (4, 4, 4), 8))(coords)
    # capacity 8 may be exceeded; true count reported, overflow voxels invalid
    assert int(layout.num_blocks[0]) >= 1
    over = np.array(layout.block_id) >= 8
    assert not over.any()
