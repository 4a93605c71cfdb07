"""Row-sharded global-covariance quadratic form on the 8-device mesh."""

import numpy as np

from vega_tpu.parallel import ShardedGlobalChi2, make_device_mesh


def _spd(n, rng):
    a = rng.normal(size=(n, n))
    return a @ a.T + n * np.eye(n)


def test_matches_numpy():
    rng = np.random.default_rng(0)
    n = 101  # deliberately not a multiple of the mesh size
    invcov = _spd(n, rng)
    diff = rng.normal(size=n)

    sharded = ShardedGlobalChi2(invcov, mesh=make_device_mesh(8))
    expected = diff @ invcov @ diff
    np.testing.assert_allclose(float(sharded.chi2(diff)), expected,
                               rtol=1e-12)


def test_batched():
    rng = np.random.default_rng(1)
    n, b = 64, 5
    invcov = _spd(n, rng)
    diffs = rng.normal(size=(b, n))

    sharded = ShardedGlobalChi2(invcov, mesh=make_device_mesh(8))
    expected = np.einsum('bi,ij,bj->b', diffs, invcov, diffs)
    np.testing.assert_allclose(np.asarray(sharded.chi2_batch(diffs)),
                               expected, rtol=1e-12)


def test_rows_actually_sharded():
    rng = np.random.default_rng(2)
    invcov = _spd(96, rng)
    sharded = ShardedGlobalChi2(invcov, mesh=make_device_mesh(8))
    shard_shapes = {s.data.shape for s in sharded._invcov.addressable_shards}
    assert shard_shapes == {(12, 96)}
