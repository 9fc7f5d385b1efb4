"""Sharded activation pool: local (collective-free) gather on the CPU mesh.

Multi-chip counterpart of the trainer's device act store: pool rows shard
over "data", the sampler aligns batches to the sharding, and each rank
gathers only its own rows (parallel/sharding.py::local_gather).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owlvit_tpu.parallel import (
    create_mesh,
    local_gather,
    local_scatter,
    shard_act_pool,
    shard_aligned_batches,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device CPU mesh")
    return create_mesh(data=4, model=1, devices=jax.devices()[:4])


def test_local_gather_matches_global_indexing(mesh):
    N, S, D, B = 16, 8, 4, 8
    acts = jnp.arange(N * S * D, dtype=jnp.float32).reshape(N, S, D)
    pool = shard_act_pool(acts, mesh)

    for idxs in shard_aligned_batches(N, B, 4, seed=3):
        got = local_gather(pool, jnp.asarray(idxs), mesh)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(acts[idxs]))
        # output stays data-sharded (no implicit replication)
        assert got.sharding.spec[0] == "data"


def test_aligned_batches_cover_each_shard_evenly(mesh):
    N, B, dp = 16, 8, 4
    seen = []
    for idxs in shard_aligned_batches(N, B, dp, seed=0):
        assert len(idxs) == B
        sub = B // dp
        for r in range(dp):
            part = idxs[r * sub : (r + 1) * sub]
            lo, hi = r * N // dp, (r + 1) * N // dp
            assert ((part >= lo) & (part < hi)).all()
        seen.extend(idxs.tolist())
    assert sorted(seen) == list(range(N))  # full epoch, no repeats


def test_local_gather_rejects_misaligned_shapes(mesh):
    acts = jnp.zeros((15, 4, 4))  # 15 % 4 != 0
    with pytest.raises(AssertionError):
        local_gather(shard_act_pool(jnp.zeros((16, 4, 4)), mesh)[:15],
                     jnp.zeros((8,), jnp.int32), mesh)


def test_local_scatter_roundtrips_with_gather(mesh):
    N, S, D, B = 16, 8, 4, 8
    pool = shard_act_pool(jnp.zeros((N, S, D)), mesh)
    rng = np.random.default_rng(2)
    written = np.zeros((N, S, D), np.float32)
    for idxs in shard_aligned_batches(N, B, 4, seed=5):
        vals = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
        pool = jax.jit(
            lambda p, i, v: local_scatter(p, i, v, mesh), donate_argnums=(0,)
        )(pool, jnp.asarray(idxs), vals)
        written[idxs] = np.asarray(vals)
        assert pool.sharding.spec[0] == "data"  # stays sharded after update
    np.testing.assert_array_equal(np.asarray(pool), written)
    # and gather reads back exactly what scatter wrote
    idxs = next(shard_aligned_batches(N, B, 4, seed=6))
    got = local_gather(pool, jnp.asarray(idxs), mesh)
    np.testing.assert_array_equal(np.asarray(got), written[idxs])


def test_local_gather_scatter_2d_pool(mesh):
    """The helpers accept any trailing rank — the int8 store's per-token
    scale array is [N, S], not [N, S, D]."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    N, S, B = 16, 8, 8
    scales = jnp.arange(N * S, dtype=jnp.float32).reshape(N, S)
    pool = jax.device_put(scales, NamedSharding(mesh, P("data", None)))
    idxs = next(shard_aligned_batches(N, B, 4, seed=7))
    got = local_gather(pool, jnp.asarray(idxs), mesh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(scales)[idxs])
    assert got.sharding.spec[0] == "data"
    newv = jnp.full((B, S), -1.0)
    pool = local_scatter(pool, jnp.asarray(idxs), newv, mesh)
    np.testing.assert_array_equal(
        np.asarray(local_gather(pool, jnp.asarray(idxs), mesh)),
        np.asarray(newv),
    )


def test_gather_feeds_sharded_tail_computation(mesh):
    """The gathered batch composes with a dp-sharded downstream jit."""
    N, S, D, B = 16, 8, 4, 8
    acts = jnp.asarray(np.random.default_rng(0).normal(size=(N, S, D)),
                       jnp.float32)
    pool = shard_act_pool(acts, mesh)
    idxs = next(shard_aligned_batches(N, B, 4, seed=1))

    @jax.jit
    def tail(pool, idxs):
        x = local_gather(pool, idxs, mesh)
        return jnp.sum(x * 2.0, axis=(1, 2))  # [B]

    with mesh:
        out = tail(pool, jnp.asarray(idxs))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.sum(acts[idxs] * 2.0, axis=(1, 2))),
        rtol=1e-6,
    )
