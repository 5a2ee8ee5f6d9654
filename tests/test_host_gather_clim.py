"""Host-gather fallback for oversized climatology resources.

Production-arity climatologies (many variables x 13 levels x 366 dayofyear
x 4 hours) cannot be device-resident: ~14 GB at 240x121 and ~200 GB at
0.25 degrees. ``ChunkEvaluator._plan_resources`` demotes the largest
gather-only arrays to a host-gather path — the statistic's prepare_chunk
aligns them on the host and ships the chunk-sized slice as a
``CLIM_VALUE_PREFIX`` device leaf. These tests pin that path to the
resident-resource result (same gather semantics, so values must match to
fp-exactness).
"""

import numpy as np
import pytest

import jax

from weatherbenchx_tpu import aggregation, test_utils
from weatherbenchx_tpu import time_chunks as time_chunks_lib
from weatherbenchx_tpu.darray import DimArray
from weatherbenchx_tpu.data import loaders
from weatherbenchx_tpu.metrics import base as mbase
from weatherbenchx_tpu.metrics import categorical, deterministic
from weatherbenchx_tpu.parallel import evaluator as evaluator_lib
from weatherbenchx_tpu.parallel import pipeline as pipeline_lib


def _datasets(seed=7, n_valid=12, n_lead=3):
  rng = np.random.default_rng(seed)
  lats = np.linspace(-90, 90, 5)
  lons = np.linspace(0, 360, 6, endpoint=False)
  valid = (np.datetime64('2020-01-01', 'ns')
           + np.arange(n_valid) * np.timedelta64(6, 'h'))
  leads = (np.arange(n_lead) * np.timedelta64(6, 'h')
           ).astype('timedelta64[ns]')
  inits = valid[:n_valid - n_lead]

  def rand(shape):
    return rng.standard_normal(shape).astype(np.float32)

  tgt = {
      '2m_temperature': DimArray(
          rand((n_valid, 5, 6)), ('valid_time', 'latitude', 'longitude'),
          {'valid_time': valid, 'latitude': lats, 'longitude': lons}),
      'precip': DimArray(
          np.abs(rand((n_valid, 5, 6))) * 0.01,
          ('valid_time', 'latitude', 'longitude'),
          {'valid_time': valid, 'latitude': lats, 'longitude': lons}),
  }
  pred = {
      '2m_temperature': DimArray(
          rand((len(inits), n_lead, 5, 6)),
          ('init_time', 'lead_time', 'latitude', 'longitude'),
          {'init_time': inits, 'lead_time': leads,
           'latitude': lats, 'longitude': lons}),
      'precip': DimArray(
          np.abs(rand((len(inits), n_lead, 5, 6))) * 0.01,
          ('init_time', 'lead_time', 'latitude', 'longitude'),
          {'init_time': inits, 'lead_time': leads,
           'latitude': lats, 'longitude': lons}),
  }
  tdims = ('dayofyear', 'hour', 'latitude', 'longitude')
  tcoords = {'dayofyear': np.arange(1, 367),
             'hour': np.array([0, 6, 12, 18]),
             'latitude': lats, 'longitude': lons}
  clim = {
      '2m_temperature': DimArray(rand((366, 4, 5, 6)), tdims, tcoords),
      'precip': DimArray(
          np.abs(rand((366, 4, 5, 6))) * 0.01, tdims, tcoords),
      'precip_seeps_dry_fraction': DimArray(
          np.clip(np.abs(rand((366, 4, 5, 6))), 0.2, 0.8), tdims, tcoords),
      'precip_seeps_threshold': DimArray(
          np.abs(rand((366, 4, 5, 6))) * 0.005 + 0.002, tdims, tcoords),
  }
  return pred, tgt, clim, inits, leads


def _metrics(clim):
  return {
      'acc': deterministic.ACC(climatology=clim),
      'activity': deterministic.PredictionActivity(climatology=clim),
      'seeps': categorical.SEEPS(variables=['precip'], climatology=clim),
      'rmse': deterministic.RMSE(),
  }


def _run(monkeypatch, budget_bytes, mesh=None, dim_to_axis=None):
  if budget_bytes is None:
    monkeypatch.delenv('WBX_RESOURCE_BYTES', raising=False)
  else:
    monkeypatch.setenv('WBX_RESOURCE_BYTES', str(budget_bytes))
  pred, tgt, clim, inits, leads = _datasets()
  agg = aggregation.Aggregator(
      reduce_dims=['init_time', 'latitude', 'longitude'], masked=True)
  times = time_chunks_lib.TimeChunks(
      inits, leads, init_time_chunk_size=3, lead_time_chunk_size=2)
  return pipeline_lib.evaluate(
      _metrics(clim), agg,
      loaders.PredictionsFromDataset(ds=pred, rename_dimensions=None),
      loaders.TargetsFromDataset(ds=tgt, rename_dimensions=None),
      times, mesh=mesh, dim_to_axis=dim_to_axis)


class TestHostGatherEquivalence:

  def test_forced_host_gather_matches_resident(self, monkeypatch):
    resident = _run(monkeypatch, None)
    gathered = _run(monkeypatch, 1)  # 1 byte: demote every eligible array
    assert set(resident) == set(gathered)
    for k in resident:
      np.testing.assert_allclose(
          np.asarray(resident[k].values), np.asarray(gathered[k].values),
          atol=1e-6, err_msg=k)

  def test_forced_host_gather_on_mesh(self, monkeypatch):
    if len(jax.devices()) < 4:
      pytest.skip('needs a multi-device mesh')
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ('space',))
    resident = _run(monkeypatch, None)
    gathered = _run(monkeypatch, 1, mesh=mesh,
                    dim_to_axis={'latitude': 'space'})
    for k in resident:
      np.testing.assert_allclose(
          np.asarray(resident[k].values), np.asarray(gathered[k].values),
          atol=1e-5, err_msg=k)


class TestResourcePlan:

  def test_plan_partitions_by_budget(self, monkeypatch):
    pred, tgt, clim, inits, leads = _datasets()
    agg = aggregation.Aggregator(reduce_dims=['latitude', 'longitude'])
    # Budget fits p1 + one small array but not the two big (366,4,...)
    # climatologies: both must be demoted, p1 must stay resident.
    big = clim['2m_temperature'].data.nbytes
    monkeypatch.setenv('WBX_RESOURCE_BYTES', str(big + 1024))
    ev = evaluator_lib.ChunkEvaluator(metrics=_metrics(clim), aggregator=agg)
    assert ev._host_gather_ids, 'expected demotions under a tight budget'
    res = ev.resources()
    assert not set(res) & set(ev._host_gather_ids)
    # SEEPS's p1 is never gatherable (used directly in compute).
    seeps = _metrics(clim)['seeps']
    stat = next(iter(seeps.statistics.values()))
    p1_rid = mbase.resource_id(stat._p1['precip'])
    assert p1_rid not in ev._host_gather_ids

  def test_no_demotion_under_default_budget(self, monkeypatch):
    monkeypatch.delenv('WBX_RESOURCE_BYTES', raising=False)
    pred, tgt, clim, inits, leads = _datasets()
    agg = aggregation.Aggregator(reduce_dims=['latitude', 'longitude'])
    ev = evaluator_lib.ChunkEvaluator(metrics=_metrics(clim), aggregator=agg)
    assert not ev._host_gather_ids

  def test_outputs_carry_no_gathered_value_coords(self, monkeypatch):
    monkeypatch.setenv('WBX_RESOURCE_BYTES', '1')
    pred, tgt, clim, inits, leads = _datasets()
    metrics = _metrics(clim)
    agg = aggregation.Aggregator(reduce_dims=['latitude', 'longitude'])
    ev = evaluator_lib.ChunkEvaluator(metrics=metrics, aggregator=agg)
    ploader = loaders.PredictionsFromDataset(ds=pred, rename_dimensions=None)
    tloader = loaders.TargetsFromDataset(ds=tgt, rename_dimensions=None)
    p = ploader.load_chunk(inits, leads)
    t = tloader.load_chunk(inits, leads)
    stats = [s for m in metrics.values() for s in m.statistics.values()]
    p = evaluator_lib.prepare_chunk(p, stats, True, t)
    # The prepared chunk DOES carry the gathered slices...
    assert any(str(n).startswith(mbase.CLIM_VALUE_PREFIX)
               for da in p.values() for n in da.coords)
    # ...but computed statistics must not re-export them.
    out = mbase.compute_unique_statistics_for_all_metrics(metrics, p, t)
    for per_var in out.values():
      for da in per_var.values():
        assert not any(str(n).startswith(mbase.CLIM_VALUE_PREFIX)
                       for n in da.coords)
