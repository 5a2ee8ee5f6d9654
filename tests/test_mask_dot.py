"""Tests for same-layout aggregation batching (``darray.dot_batched``).

``Aggregator.aggregate_statistics`` groups same-layout (statistic,
variable, num/den) contractions (reference semantics: separate
``xr.dot`` calls, /root/reference/weatherbenchX/aggregation.py:290-328)
and, when the traffic model says the stack copy costs less than the
shared-operand re-reads it saves, lowers each group as ONE batched
contraction. TPU-gated in production; ``WBX_AGG_BATCH=force`` exercises
the lowering on the CPU suite. (Round 4's manual bf16-split MXU mask
path was removed in round 5 after on-chip measurement — see
``darray.dot`` history note.)
"""

import numpy as np
import pytest

from weatherbenchx_tpu import aggregation, binning, darray, weighting
from weatherbenchx_tpu.darray import DimArray


def _rel(a, b):
  a = np.asarray(a, np.float64)
  b = np.asarray(b, np.float64)
  return float(np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-9)))


def _mk(seed, shape, dims, **coords):
  rng = np.random.default_rng(seed)
  return DimArray(rng.standard_normal(shape).astype(np.float32), dims,
                  coords or None)


class TestDotBatched:

  def test_matches_per_item_dot(self):
    w = DimArray(np.abs(np.random.default_rng(0).standard_normal(19)
                        ).astype(np.float32), ('lat',))
    m = DimArray(np.random.default_rng(1).random((5, 19, 23)) > 0.4,
                 ('bin', 'lat', 'lon'))
    stats = [_mk(i, (4, 19, 23), ('lead', 'lat', 'lon')) for i in range(6)]
    singles = [darray.dot(s, w, m, dim=('lat', 'lon')) for s in stats]
    batched = darray.dot_batched(stats, w, m, dim=('lat', 'lon'))
    assert len(batched) == 6
    for a, b in zip(singles, batched):
      assert a.dims == b.dims
      scale = float(np.max(np.abs(np.asarray(a.data))))
      np.testing.assert_allclose(np.asarray(b.data), np.asarray(a.data),
                                 rtol=1e-5, atol=1e-6 * scale)

  def test_rejects_mixed_layouts(self):
    a = _mk(0, (4, 19), ('lead', 'lat'))
    b = _mk(1, (19, 4), ('lat', 'lead'))
    with pytest.raises(ValueError, match='identical dims/shape'):
      darray.dot_batched([a, b], dim=('lat',))

  def test_single_and_empty(self):
    a = _mk(0, (4, 19), ('lead', 'lat'))
    assert darray.dot_batched([], dim=('lat',)) == []
    (out,) = darray.dot_batched([a], dim=('lat',))
    ref = darray.dot(a, dim=('lat',))
    np.testing.assert_array_equal(np.asarray(out.data),
                                  np.asarray(ref.data))


class TestAggregatorBatching:

  def _setup(self, masked=False, skipna=False):
    nlat, nlon = 13, 24
    lats = np.linspace(-90, 90, nlat)
    lons = np.linspace(0, 360, nlon, endpoint=False)
    coords = {'latitude': lats, 'longitude': lons}
    rng = np.random.default_rng(0)

    def da(seed, with_nan=False, extra_level=False):
      r = np.random.default_rng(seed)
      shape = (2, nlat, nlon) if not extra_level else (2, 3, nlat, nlon)
      dims = (('lead_time', 'latitude', 'longitude') if not extra_level
              else ('lead_time', 'level', 'latitude', 'longitude'))
      v = r.standard_normal(shape).astype(np.float32)
      if with_nan:
        v[(0,) * (v.ndim - 2) + (1, 2)] = np.nan
      c = dict(coords)
      if masked:
        c['mask'] = (dims[-2:], r.random(shape[-2:]) > 0.2)
      return DimArray(v, dims, c)

    land = DimArray(rng.random((nlat, nlon)) > 0.5,
                    ('latitude', 'longitude'), coords)
    regions = {'global': ((-90.0, 90.0), (0.0, 360.0)),
               'tropics': ((-20.0, 20.0), (0.0, 360.0))}
    agg = aggregation.Aggregator(
        reduce_dims=['latitude', 'longitude'],
        bin_by=[binning.Regions(regions, land_sea_mask=land)],
        weigh_by=[weighting.GridAreaWeighting()],
        masked=masked, skipna=skipna)
    stats = {
        'se': {'a': da(1), 'b': da(2, with_nan=skipna)},
        'err': {'a': da(3), 'b': da(4)},
        # a different layout in the same family: groups must not mix
        'lvl': {'a': da(5, extra_level=True)},
    }
    return agg, stats

  @pytest.mark.parametrize('masked,skipna',
                           [(False, False), (True, False),
                            (True, True), (False, True)])
  def test_batched_equals_unbatched(self, masked, skipna, monkeypatch):
    agg, stats = self._setup(masked=masked, skipna=skipna)
    monkeypatch.setenv('WBX_AGG_BATCH', 'off')
    ref = agg.aggregate_statistics(stats)
    monkeypatch.setenv('WBX_AGG_BATCH', 'force')
    got = agg.aggregate_statistics(stats)
    for side in ('sum_weighted_statistics', 'sum_weights'):
      r, g = getattr(ref, side), getattr(got, side)
      assert set(r) == set(g)
      for name in r:
        assert set(r[name]) == set(g[name])
        for var in r[name]:
          ra, ga = r[name][var], g[name][var]
          assert ra.dims == ga.dims
          rv, gv = np.asarray(ra.data), np.asarray(ga.data)
          ok = ~np.isnan(rv)
          assert np.array_equal(ok, ~np.isnan(gv))
          np.testing.assert_allclose(gv[ok], rv[ok], rtol=1e-5, atol=1e-7)

  def test_metric_values_end_to_end(self, monkeypatch):
    # finalize through metric_values so output coords survive batching
    from weatherbenchx_tpu.metrics import deterministic
    agg, _ = self._setup(masked=False)
    nlat, nlon = 13, 24
    coords = {'latitude': np.linspace(-90, 90, nlat),
              'longitude': np.linspace(0, 360, nlon, endpoint=False)}
    dims = ('lead_time', 'latitude', 'longitude')
    rng = np.random.default_rng(7)
    p = {'a': DimArray(rng.standard_normal((2, nlat, nlon)
                                           ).astype(np.float32),
                       dims, coords)}
    t = {'a': DimArray(rng.standard_normal((2, nlat, nlon)
                                           ).astype(np.float32),
                       dims, coords)}
    metrics = {'rmse': deterministic.RMSE(), 'bias': deterministic.Bias()}
    monkeypatch.setenv('WBX_AGG_BATCH', 'off')
    ref = aggregation.compute_metric_values_for_single_chunk(
        metrics, agg, p, t)
    monkeypatch.setenv('WBX_AGG_BATCH', 'force')
    got = aggregation.compute_metric_values_for_single_chunk(
        metrics, agg, p, t)
    assert set(ref) == set(got)
    for k in ref:
      assert got[k].dims == ref[k].dims
      assert sorted(got[k].coords) == sorted(ref[k].coords)
      np.testing.assert_allclose(np.asarray(got[k].data),
                                 np.asarray(ref[k].data),
                                 rtol=1e-5, atol=1e-7)

  def test_auto_batch_gated_by_regime_change(self, monkeypatch):
    """auto batches only when stacking CHANGES the lowering regime
    (per-statlike VPU -> batched MXU). Round-5 on-chip rule: REV /
    rank-histogram-shaped groups whose per-statlike dot is already
    matmul-routed must stay unbatched (batching measured 2.09 vs 0.68
    and 5.6 vs 3.3 ms/step there), while the deterministic family's
    small-row groups must batch (3.2 vs 5.9)."""
    import weatherbenchx_tpu.aggregation as agg_mod
    monkeypatch.setenv('WBX_AGG_BATCH', 'auto')
    monkeypatch.setattr(agg_mod.jax, 'default_backend', lambda: 'tpu')
    calls = []
    orig = darray.dot_batched
    monkeypatch.setattr(
        agg_mod.darray, 'dot_batched',
        lambda *a, **k: calls.append(len(a[0])) or orig(*a, **k))

    # A production-proportioned aggregator: >8 bins (5 lat bands x
    # all/land = 10 regions) so the batched form is matmul-shaped.
    nlat, nlon = 13, 24
    lats = np.linspace(-90, 90, nlat)
    lons = np.linspace(0, 360, nlon, endpoint=False)
    coords = {'latitude': lats, 'longitude': lons}
    rng = np.random.default_rng(0)
    land = DimArray(rng.random((nlat, nlon)) > 0.5,
                    ('latitude', 'longitude'), coords)
    regions = {f'band{i}': ((-90.0 + 36.0 * i, -54.0 + 36.0 * i),
                            (0.0, 360.0)) for i in range(5)}
    agg = aggregation.Aggregator(
        reduce_dims=['latitude', 'longitude'],
        bin_by=[binning.Regions(regions, land_sea_mask=land)],
        weigh_by=[weighting.GridAreaWeighting()])

    def da(seed, extra=()):
      r = np.random.default_rng(seed)
      dims = ('lead_time',) + tuple(n for n, _ in extra) + (
          'latitude', 'longitude')
      shape = (2,) + tuple(s for _, s in extra) + (nlat, nlon)
      return DimArray(r.standard_normal(shape).astype(np.float32),
                      dims, coords)

    # Deterministic-shaped group: 3 stats x 2 vars -> 12 statlikes of
    # 2 lead rows each. Per-statlike ratio product/max_operand = 2
    # (VPU); batched rows 24 > 8 against the 10-bin mask (MXU) -> batch.
    stats = {'se': {'a': da(1), 'b': da(2)},
             'err': {'a': da(3), 'b': da(4)},
             'bias': {'a': da(5), 'b': da(6)}}
    agg.aggregate_statistics(stats)
    assert calls, 'small-row group must batch under auto'
    calls.clear()

    # Rank-histogram shaped: a 64-rank non-reduced dim makes the
    # per-statlike dot ALREADY matmul-routed -> batching only adds the
    # stack copy -> no batch.
    big = {'rh': {'a': da(7, extra=(('rank', 64),))}}
    agg.aggregate_statistics(big)
    assert not calls, 'matmul-shaped group must NOT batch under auto'

  def test_operands_stay_bool(self):
    # prepare_operands must keep bin masks bool (the MXU trigger and the
    # 4x smaller device copy).
    import jax
    agg, stats = self._setup()
    abstract = {
        name: {var: DimArray(
            jax.ShapeDtypeStruct(s.shape, s.dtype), s.dims, s.coords)
            for var, s in per.items()}
        for name, per in stats.items()}
    ops = agg.prepare_operands(abstract)
    kinds = {np.dtype(o.dtype).kind for o in ops['se']['a']}
    assert 'b' in kinds, kinds  # the Regions mask
    assert 'f' in kinds, kinds  # the area weights
