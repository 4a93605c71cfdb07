"""Grid-payload fingerprint: content keying of the disk cache.

The payload depends on the sampling limits through measure_dc_max
(the truncation budget is scaled by the coefficient range over the
sampling box), but the fingerprint hashes the CONFIG — so
programmatically mutated limits must be folded in explicitly
(VegaInterface._get_grid_collapsed `extra=`) or a stale cached payload
could serve a different budget. Config-derived limits hash to nothing,
keeping existing cache entries valid.
"""

from pathlib import Path

import pytest

from vega_tpu.testing import make_synthetic_dataset
from vega_tpu.vega_interface import VegaInterface


@pytest.fixture(scope='module')
def vega(tmp_path_factory):
    workdir = tmp_path_factory.mktemp('fp')
    sample = {'ap': 'True', 'at': 'True',
              'bias_LYA': 'True', 'beta_LYA': 'True'}
    main_path = make_synthetic_dataset(workdir, cross=True, sample=sample,
                                       noise=1.0, size='tiny')
    return VegaInterface(main_path)


def _fingerprint(vega, extra=None):
    from vega_tpu.gridcollapse import GridSpec, payload_fingerprint
    spec = GridSpec(('ap', 'at'), (0.9, 0.9), (1.1, 1.1), (8, 8),
                    (1.0, 1.0))
    vega._ensure_static_refs()
    return payload_fingerprint(
        vega, ['ap', 'at', 'bias_LYA', 'beta_LYA'], spec, 2e-4, 1e-12,
        extra=extra)


def test_fingerprint_deterministic(vega):
    assert _fingerprint(vega) == _fingerprint(vega)


def test_extra_content_changes_fingerprint(vega):
    base = _fingerprint(vega)
    assert _fingerprint(vega, extra='mutated-limits') != base


def test_mutated_limits_change_cache_key(vega, tmp_path, monkeypatch):
    """End-to-end through _get_grid_collapsed: the cache PATH must
    differ once sample limits are mutated post-init, and must be stable
    when they are not."""
    import os
    from unittest import mock

    monkeypatch.setenv('VEGA_TPU_GRID_CACHE_DIR', str(tmp_path))
    seen = []

    orig = VegaInterface._get_grid_collapsed

    import vega_tpu.gridcollapse as gc
    real_fp = gc.payload_fingerprint

    def spy_fp(*args, **kwargs):
        fp = real_fp(*args, **kwargs)
        seen.append(fp)
        return fp

    with mock.patch.object(gc, 'payload_fingerprint', spy_fp):
        # intercept the build itself: fingerprinting happens before
        # build_grid_payload, so raising there keeps the test fast
        with mock.patch.object(
                gc, 'build_grid_payload',
                side_effect=RuntimeError('stop-after-fingerprint')):
            key = ('ap', 'at', 'bias_LYA', 'beta_LYA')
            with pytest.raises(RuntimeError, match='stop-after'):
                orig(vega, key, ('ap', 'at'))
            vega._grid_cache.clear()
            with pytest.raises(RuntimeError, match='stop-after'):
                orig(vega, key, ('ap', 'at'))
            vega._grid_cache.clear()
            # mutate a NON-grid sampled limit -> new fingerprint
            vega.sample_params['limits']['beta_LYA'] = (0.5, 2.5)
            try:
                with pytest.raises(RuntimeError, match='stop-after'):
                    orig(vega, key, ('ap', 'at'))
            finally:
                vega.sample_params['limits']['beta_LYA'] = \
                    vega._config_limits['beta_LYA']
                vega._grid_cache.clear()

    assert len(seen) == 3
    assert seen[0] == seen[1], 'unmutated fingerprint must be stable'
    assert seen[2] != seen[0], 'mutated limits must change the key'
