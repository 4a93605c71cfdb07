"""Sharded global-covariance quadratic form.

The joint-analysis mode fits all correlations against one global
covariance (reference: vega_interface.py global-covariance path +
build_covariance.py). For the eBOSS/DESI configs the masked inverse
covariance is a few-thousand-square matrix and lives comfortably
replicated on one chip; for joint vectors of O(10^4-10^5) bins the
(N, N) f64 matrix (0.8 GB at N=10^4, 80 GB at N=10^5) must shard.

This component shards the inverse covariance ROW-WISE over a 1D device
mesh and evaluates

    chi^2 = diff^T C^{-1} diff

under jit with sharding annotations: the matvec runs on each device's
row block against the replicated diff, and XLA's SPMD partitioner
inserts the single psum for the final contraction over ICI. Throughput
scales with devices and, more importantly, HBM capacity scales to
N ~ sqrt(n_devices * HBM / 8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .batch import make_device_mesh


class ShardedGlobalChi2:
    """Row-sharded chi^2 = diff^T C^{-1} diff over a device mesh.

    Rows are padded with zeros to a multiple of the mesh size (zero
    rows contribute nothing to the quadratic form).
    """

    def __init__(self, global_invcov, mesh=None, axis_name='shard'):
        invcov = np.asarray(global_invcov)
        assert invcov.ndim == 2 and invcov.shape[0] == invcov.shape[1]
        self.n = invcov.shape[0]
        self.mesh = mesh if mesh is not None else make_device_mesh(
            axis_name=axis_name)
        self.axis_name = (self.mesh.axis_names[0]
                          if mesh is not None else axis_name)

        n_dev = self.mesh.devices.size
        pad = (-self.n) % n_dev
        if pad:
            invcov = np.pad(invcov, ((0, pad), (0, pad)))
        self._row_sharding = NamedSharding(self.mesh, P(self.axis_name,
                                                        None))
        self._replicated = NamedSharding(self.mesh, P())
        # rows sharded across devices; columns stay full
        self._invcov = jax.device_put(invcov, self._row_sharding)
        self._pad = pad

        def quad(diff):
            d = jnp.pad(diff, (0, self._pad)) if self._pad else diff
            partial = self._invcov @ d  # (n+pad,), row-sharded
            return d @ partial  # contraction -> psum over the mesh

        self._quad = jax.jit(quad, out_shardings=self._replicated)
        # batched variant: diffs (B, n) replicated; each column block of
        # the matmul is local, the final contraction reduces over ICI
        self._quad_batch = jax.jit(
            lambda diffs: jax.vmap(quad)(diffs),
            out_shardings=self._replicated)

    def chi2(self, diff):
        """diff: (n,) -> scalar chi^2."""
        diff = jnp.asarray(diff)
        assert diff.shape == (self.n,)
        return self._quad(jax.device_put(diff, self._replicated))

    def chi2_batch(self, diffs):
        """diffs: (B, n) -> (B,) chi^2 values."""
        diffs = jnp.asarray(diffs)
        assert diffs.ndim == 2 and diffs.shape[1] == self.n
        return self._quad_batch(jax.device_put(diffs, self._replicated))
