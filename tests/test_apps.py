"""CLI apps + unaggregated pipeline tests."""

import os

import numpy as np
import pytest

from weatherbenchx_tpu import aggregation, io as io_lib, test_utils
from weatherbenchx_tpu import time_chunks as tc
from weatherbenchx_tpu.aggregation import AggregationState
from weatherbenchx_tpu.apps import combine_results, configs
from weatherbenchx_tpu.apps import run_benchmark_evaluation, run_evaluation
from weatherbenchx_tpu.darray import Coord, DimArray
from weatherbenchx_tpu.data import loaders
from weatherbenchx_tpu.metrics import deterministic
from weatherbenchx_tpu.parallel import unaggregated


def _write_source_files(tmp_path, n_valid=12, n_lead=4, grid=10.0,
                        with_extras=False, ens=None):
  rng = np.random.default_rng(0)
  lats = np.linspace(-90, 90, round(180 / grid) + 1)
  lons = np.linspace(0, 360, round(360 / grid), endpoint=False)
  valid = (np.datetime64('2020-01-01', 'ns')
           + np.arange(n_valid) * np.timedelta64(12, 'h'))
  init = valid[:n_valid - n_lead]
  lead = (np.arange(n_lead) * np.timedelta64(12, 'h')).astype(
      'timedelta64[ns]')
  tshape = (n_valid, len(lats), len(lons))
  tgt = {'2m_temperature': DimArray(
      280 + rng.standard_normal(tshape).astype(np.float32),
      ('time', 'latitude', 'longitude'),
      {'time': valid, 'latitude': lats, 'longitude': lons})}
  if with_extras:
    tgt['land_sea_mask'] = DimArray(
        (rng.random((len(lats), len(lons))) > 0.5).astype(np.float32),
        ('latitude', 'longitude'), {'latitude': lats, 'longitude': lons})
  pshape = (len(init), n_lead, len(lats), len(lons))
  pdims = ('time', 'prediction_timedelta', 'latitude', 'longitude')
  pcoords = {'time': init, 'prediction_timedelta': lead,
             'latitude': lats, 'longitude': lons}
  if ens:
    pshape = (ens,) + pshape
    pdims = ('number',) + pdims
    pcoords['number'] = np.arange(ens)
  pred = {'2m_temperature': DimArray(
      280 + rng.standard_normal(pshape).astype(np.float32), pdims, pcoords)}
  ppath = str(tmp_path / 'pred.npz')
  tpath = str(tmp_path / 'tgt.npz')
  io_lib.save_dataset(ppath, pred)
  io_lib.save_dataset(tpath, tgt)
  # dayofyear/hour climatology with quantile fields for SEEPS-free runs.
  clim = {'2m_temperature': DimArray(
      280 + rng.standard_normal((366, 2, len(lats), len(lons))
                                ).astype(np.float32),
      ('dayofyear', 'hour', 'latitude', 'longitude'),
      {'dayofyear': np.arange(1, 367), 'hour': np.array([0, 12]),
       'latitude': lats, 'longitude': lons})}
  cpath = str(tmp_path / 'clim.npz')
  io_lib.save_dataset(cpath, clim)
  return ppath, tpath, cpath, init, lead


class TestRunEvaluationCLI:
  def test_end_to_end(self, tmp_path, capsys):
    ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
    out = str(tmp_path / 'results.npz')
    state_out = str(tmp_path / 'state.npz')
    run_evaluation.main([
        '--prediction_path', ppath, '--target_path', tpath,
        '--time_start', '2020-01-01', '--time_stop', '2020-01-05',
        '--time_frequency', '12', '--lead_time_stop', '48',
        '--lead_time_frequency', '12',
        '--variables', '2m_temperature',
        '--output_path', out,
        '--aggregation_state_output_path', state_out,
    ])
    results = io_lib.load_dataset(out)
    assert 'rmse.2m_temperature' in results
    assert 'mse.2m_temperature' in results
    da = results['rmse.2m_temperature']
    assert da.dims == ('lead_time', 'region')  # lead_time preserved
    np.testing.assert_array_equal(
        da.coord_values('region'), ['global', 'northern-hemisphere'])
    assert np.isfinite(np.asarray(da.values)).all()
    # RMSE^2 == MSE.
    np.testing.assert_allclose(
        np.asarray(da.values) ** 2,
        np.asarray(results['mse.2m_temperature'].values), rtol=1e-5)
    # State round-trips and reproduces metric values.
    state = AggregationState.load(state_out)
    v2 = state.metric_values({'rmse': deterministic.RMSE()})
    np.testing.assert_allclose(
        np.asarray(v2['rmse.2m_temperature'].values),
        np.asarray(da.values), rtol=1e-6)

  def test_missing_required_flag(self, tmp_path):
    with pytest.raises(SystemExit):
      run_evaluation.main(['--target_path', 'x.npz',
                           '--output_path', 'y.npz'])


class TestBenchmarkCLI:
  def test_deterministic_with_overrides(self, tmp_path):
    ppath, tpath, cpath, init, lead = _write_source_files(
        tmp_path, with_extras=True)
    outdir = str(tmp_path / 'results')
    run_benchmark_evaluation.main([
        '--prediction', 'hres', '--target', 'era5',
        '--resolution', '64x32', '--year', '2020',
        '--variables', '2m_temperature',
        '--time_frequency', '12',
        '--init_time_start', '2020-01-01',
        '--init_time_stop', '2020-01-03',
        '--lead_time_stop_days', '2', '--lead_time_frequency', '12',
        '--init_time_chunk_size', '4', '--lead_time_chunk_size', '4',
        '--output_dir', outdir,
        '--prediction_path', ppath, '--target_path', tpath,
        '--climatology_path', cpath,
    ])
    out_file = os.path.join(
        outdir, 'hres_vs_era5_64x32_2020-init12h.npz')
    results = io_lib.load_dataset(out_file)
    da = results['rmse.2m_temperature']
    # Region dim includes land-augmented bins (17 regions + 17 _land).
    assert da.sizes['region'] == 34
    assert 'acc.2m_temperature' in results
    assert 'prediction_activity.2m_temperature' in results
    global_rmse = da.sel(region='global')
    assert np.isfinite(np.asarray(global_rmse.values)).all()

  def test_zarr_output_format(self, tmp_path):
    """--output_format=zarr writes a standard store equal to the npz run."""
    ppath, tpath, cpath, init, lead = _write_source_files(
        tmp_path, with_extras=True)
    common = [
        '--prediction', 'hres', '--target', 'era5',
        '--resolution', '64x32', '--year', '2020',
        '--variables', '2m_temperature',
        '--time_frequency', '12',
        '--init_time_start', '2020-01-01',
        '--init_time_stop', '2020-01-03',
        '--lead_time_stop_days', '2', '--lead_time_frequency', '12',
        '--init_time_chunk_size', '4', '--lead_time_chunk_size', '4',
        '--prediction_path', ppath, '--target_path', tpath,
        '--climatology_path', cpath,
    ]
    npz_dir, zarr_dir = str(tmp_path / 'npz'), str(tmp_path / 'zarr')
    run_benchmark_evaluation.main(common + ['--output_dir', npz_dir])
    run_benchmark_evaluation.main(
        common + ['--output_dir', zarr_dir, '--output_format', 'zarr'])
    base = 'hres_vs_era5_64x32_2020-init12h'
    ref = io_lib.load_dataset(os.path.join(npz_dir, base + '.npz'))
    got = io_lib.load_dataset(os.path.join(zarr_dir, base + '.zarr'))
    assert set(got) == set(ref)
    for k in ref:
      assert got[k].dims == ref[k].dims
      np.testing.assert_array_equal(
          np.asarray(got[k].values), np.asarray(ref[k].values))

  def test_levels_subset_climatology(self, tmp_path):
    """--levels must subset the climatology too: ACC/activity broadcast
    against it, so an unsubset level axis silently widens their outputs
    (and desyncs the level coord from the data)."""
    rng = np.random.default_rng(0)
    lats = np.linspace(-90, 90, 7)
    lons = np.linspace(0, 300, 6)
    levels = np.array([500, 700, 850])
    valid = (np.datetime64('2020-01-01', 'ns')
             + np.arange(6) * np.timedelta64(12, 'h'))
    init, lead = valid[:4], (np.arange(2) * np.timedelta64(12, 'h')).astype(
        'timedelta64[ns]')
    space = {'level': levels, 'latitude': lats, 'longitude': lons}
    tgt = {'geopotential': DimArray(
        rng.standard_normal((6, 3, 7, 6)).astype(np.float32),
        ('time', 'level', 'latitude', 'longitude'),
        {'time': valid, **space})}
    pred = {'geopotential': DimArray(
        rng.standard_normal((4, 2, 3, 7, 6)).astype(np.float32),
        ('time', 'prediction_timedelta', 'level', 'latitude', 'longitude'),
        {'time': init, 'prediction_timedelta': lead, **space})}
    clim = {'geopotential': DimArray(
        rng.standard_normal((366, 2, 3, 7, 6)).astype(np.float32),
        ('dayofyear', 'hour', 'level', 'latitude', 'longitude'),
        {'dayofyear': np.arange(1, 367), 'hour': np.array([0, 12]),
         **space})}
    paths = {}
    for name, ds in [('pred', pred), ('tgt', tgt), ('clim', clim)]:
      paths[name] = str(tmp_path / f'{name}.npz')
      io_lib.save_dataset(paths[name], ds)
    outdir = str(tmp_path / 'results')
    run_benchmark_evaluation.main([
        '--prediction', 'hres', '--target', 'era5',
        '--resolution', '64x32', '--year', '2020',
        '--variables', 'geopotential', '--levels', '500',
        '--time_frequency', '12',
        '--init_time_start', '2020-01-01', '--init_time_stop', '2020-01-03',
        '--lead_time_stop_days', '1', '--lead_time_frequency', '12',
        '--init_time_chunk_size', '4', '--lead_time_chunk_size', '4',
        '--output_dir', outdir,
        '--prediction_path', paths['pred'], '--target_path', paths['tgt'],
        '--climatology_path', paths['clim'],
    ])
    results = io_lib.load_dataset(
        os.path.join(outdir, 'hres_vs_era5_64x32_2020-init12h.npz'))
    for key in ('rmse.geopotential', 'acc.geopotential',
                'prediction_activity.geopotential'):
      assert results[key].sizes['level'] == 1, key
      np.testing.assert_array_equal(
          np.asarray(results[key].coords['level'].values), [500])

  def test_regions_registry(self):
    assert len(configs.REGIONS) == 17
    assert configs.REGIONS['tropics'] == ((-20, 20), (0, 360))
    assert 'hres_64x32_2020' in configs.deterministic_prediction_configs
    assert 'ens_240x121_2020' in configs.probabilistic_prediction_configs
    sm = configs.single_member_configs()
    assert any(k.startswith('ens_single_member') for k in sm)


class TestCombineResults:
  def test_combine(self, tmp_path):
    # Two fake per-model result files.
    regions = np.array(['global', 'tropics'])
    for model, val in [('hres', 1.0), ('graphcast', 2.0)]:
      ds = {
          'rmse.2m_temperature': DimArray(
              np.full(2, val), ('region',), {'region': regions}),
          'bias.2m_temperature': DimArray(
              np.full(2, val / 10), ('region',), {'region': regions}),
      }
      io_lib.save_dataset(
          str(tmp_path / f'{model}_vs_era5_64x32.npz'), ds)
    out = str(tmp_path / 'scorecard.npz')
    combine_results.main(['--results_dir', str(tmp_path),
                          '--output_path', out])
    sc = io_lib.load_dataset(out)
    da = sc['2m_temperature']
    assert set(da.dims) == {'model', 'metric', 'region'}
    np.testing.assert_array_equal(
        da.coord_values('model'), ['graphcast', 'hres'])
    np.testing.assert_array_equal(
        sorted(da.coord_values('metric')), ['Bias', 'RMSE'])
    hres = da.sel(model='hres', metric='RMSE')
    np.testing.assert_allclose(np.asarray(hres.values), [1.0, 1.0])


class TestUnaggregatedPipeline:
  def test_stream_and_assemble(self, tmp_path):
    ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
    metrics = {'rmse': deterministic.RMSE()}
    times = tc.TimeChunks(init, lead, init_time_chunk_size=4,
                          lead_time_chunk_size=2)
    out = unaggregated.define_unaggregated_pipeline(
        metrics,
        loaders.PredictionsFromDataset(path=ppath,
                                       variables=['2m_temperature']),
        loaders.TargetsFromDataset(path=tpath,
                                   variables=['2m_temperature']),
        times, out_path=str(tmp_path / 'unagg'))
    assembled = unaggregated.load_unaggregated(out)
    da = assembled['SquaredError.2m_temperature']
    assert da.sizes['init_time'] == len(init)
    assert da.sizes['lead_time'] == len(lead)
    # Matches the direct statistic computation.
    pl = loaders.PredictionsFromDataset(path=ppath,
                                        variables=['2m_temperature'])
    tl = loaders.TargetsFromDataset(path=tpath,
                                    variables=['2m_temperature'])
    p = pl.load_chunk(init, lead)
    t = tl.load_chunk(init, lead)
    direct = deterministic.SquaredError().compute(p, t)['2m_temperature']
    np.testing.assert_allclose(
        np.asarray(da.transpose(*direct.dims).values),
        np.asarray(direct.values), atol=1e-5)
    # Offsets in the manifest.
    import json
    with open(os.path.join(out, 'manifest.json')) as f:
      manifest = json.load(f)
    assert len(manifest['shards']) == len(times)


class TestUnaggregatedResources:
  def test_climatology_passed_as_device_argument(self, tmp_path):
    """ACC's climatology must reach the unaggregated jitted stats step as a
    device ARGUMENT (metrics_base.device_resources), not baked into the
    program as a trace-time constant — same contract as
    ChunkEvaluator._eval_fn (at 0.25 deg the constant is >100 MB/program)."""
    ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
    clim = io_lib.load_dataset(cpath)
    metrics = {'acc': deterministic.ACC(climatology=clim)}
    times = tc.TimeChunks(init, lead, init_time_chunk_size=4,
                          lead_time_chunk_size=2)
    pipe = unaggregated.UnaggregatedPipeline(
        metrics=metrics,
        predictions_loader=loaders.PredictionsFromDataset(
            path=ppath, variables=['2m_temperature']),
        targets_loader=loaders.TargetsFromDataset(
            path=tpath, variables=['2m_temperature']),
        times=times, out_path=str(tmp_path / 'unagg'))
    seen = []
    inner = pipe._stats_fn

    def spy(p, t, resources=None):
      seen.append(resources)
      return inner(p, t, resources)

    pipe._stats_fn = spy
    out = pipe.run()
    assert seen, 'stats step never ran'
    for res in seen:
      assert res, 'climatology resources not forwarded to the jitted step'
    assembled = unaggregated.load_unaggregated(out)
    anom_keys = [k for k in assembled
                 if 'nomal' in k.lower() or 'acc' in k.lower()]
    assert anom_keys, list(assembled)
    for k in anom_keys:
      assert np.isfinite(np.asarray(assembled[k].values)).all(), k


class TestConfigRegistry:
  def test_reference_key_coverage(self):
    """Every reference {model}_{res}_{year} key resolves in our registry."""
    from weatherbenchx_tpu.apps import configs
    expected = [
        'hres_64x32_2018', 'hres_1440x721_2022',
        'ens_mean_240x121_2020', 'era5_forecast_64x32_2018',
        'pangu_1440x721_2022', 'pangu_hres_init_240x121_2020',
        'keisler_64x32_2020', 'fuxi_1440x721_2020',
        'neuralgcm_hres_240x121_2020', 'neuralgcm_ens_mean_64x32_2020',
    ]
    for key in expected:
      assert key in configs.deterministic_prediction_configs, key
    for key in ['ens_64x32_2018', 'ens_1440x721_2022',
                'neuralgcm_ens_240x121_2020']:
      assert key in configs.probabilistic_prediction_configs, key
    for key in ['era5_64x32', 'hres_t0_1440x721']:
      assert key in configs.target_configs, key
    for key in ['era5_64x32_2018', 'era5_240x121_2020', 'era5_1440x721']:
      assert key in configs.climatology_configs, key
    # Climatological period follows the eval year.
    assert '1990-2017' in configs.climatology_configs['era5_64x32_2018']['path']
    assert '1990-2019' in configs.climatology_configs['era5_64x32_2020']['path']

  def test_model_quirks(self):
    from weatherbenchx_tpu.apps import configs
    k = configs.deterministic_prediction_configs['keisler_64x32_2020']
    assert k['data_loader_kwargs'] == {'add_nan_mask': True}
    assert k['aggregator_kwargs'] == {'skipna': True}
    f = configs.deterministic_prediction_configs['fuxi_64x32_2020']
    assert f['levels'] == [500, 850]
    assert 'specific_humidity' not in f['variables']
    n = configs.probabilistic_prediction_configs['neuralgcm_ens_64x32_2020']
    assert n['data_loader_kwargs']['rename_dimensions'][
        'realization'] == 'number'
    m0 = configs.deterministic_prediction_configs[
        'ens_single_member_64x32_2020']
    assert m0['data_loader_kwargs']['isel_kwargs'] == {'number': 0}

  def test_era5_target_sorts_latitude(self):
    import numpy as np
    from weatherbenchx_tpu.apps import configs
    from weatherbenchx_tpu.darray import DimArray
    fn = configs.target_configs['era5_64x32']['data_loader_kwargs'][
        'preprocessing_fn']
    ds = {'t': DimArray(np.arange(3.0), ('latitude',),
                        {'latitude': np.array([30.0, 0.0, -30.0])}),
          'scalar': DimArray(np.float32(1.0), ())}
    out = fn(ds)
    np.testing.assert_array_equal(out['t'].coord_values('latitude'),
                                  [-30.0, 0.0, 30.0])
    np.testing.assert_array_equal(np.asarray(out['t'].values), [2.0, 1.0, 0.0])


class TestHeterogeneousCombine:
  def test_different_metric_sets_and_ranks(self, tmp_path):
    """Deterministic + probabilistic results (different metric sets AND
    different variable ranks) combine with NaN holes, not a crash."""
    from weatherbenchx_tpu.darray import Coord, DimArray
    leads = np.array([0, 6], 'timedelta64[h]').astype('timedelta64[ns]')
    regions = np.array(['global'])
    det = {
        'rmse.z': DimArray(
            np.ones((2, 3, 1)), ('lead_time', 'level', 'region'),
            {'lead_time': leads, 'level': np.array([500, 700, 850]),
             'region': regions}),
        'rmse.t2m': DimArray(np.ones((2, 1)), ('lead_time', 'region'),
                             {'lead_time': leads, 'region': regions}),
    }
    prob = {
        'crps.t2m': DimArray(np.full((2, 1), 0.5), ('lead_time', 'region'),
                             {'lead_time': leads, 'region': regions}),
    }
    io_lib.save_dataset(str(tmp_path / 'hres_vs_x.npz'), det)
    io_lib.save_dataset(str(tmp_path / 'ens_vs_x.npz'), prob)
    out = combine_results.combine_model_results({
        'hres': str(tmp_path / 'hres_vs_x.npz'),
        'ens': str(tmp_path / 'ens_vs_x.npz')})
    z = out['z']
    assert z.dims == ('model', 'metric', 'lead_time', 'level', 'region')
    ens_row = np.asarray(z.sel(model='ens').values)
    assert np.isnan(ens_row).all()  # ens has no z at all -> NaN hole
    t2m = out['t2m']
    crps = t2m.sel(model='ens', metric='CRPS')
    np.testing.assert_allclose(np.asarray(crps.values), 0.5)
    assert np.isnan(
        np.asarray(t2m.sel(model='hres', metric='CRPS').values)).all()
    np.testing.assert_allclose(
        np.asarray(t2m.sel(model='hres', metric='RMSE').values), 1.0)


class TestCrossComboAlignment:
  def _save(self, tmp_path, fn, leads_h, levels, val):
    leads = np.array(leads_h, 'timedelta64[h]').astype('timedelta64[ns]')
    ds = {'rmse.z': DimArray(
        np.full((len(leads), len(levels)), val), ('lead_time', 'level'),
        {'lead_time': leads, 'level': np.array(levels)})}
    io_lib.save_dataset(str(tmp_path / fn), ds)

  def test_year_stack_outer_joins_labeled_dims(self, tmp_path):
    """Combos with different lead extents / level sets stack label-aligned
    with NaN holes — the xr.merge outer-join the reference gets for free."""
    self._save(tmp_path, 'hres_vs_era5_64x32_2020.npz',
               [0, 6, 12], [500, 850], 1.0)
    self._save(tmp_path, 'hres_vs_era5_64x32_2022.npz',
               [0, 6], [500, 700], 2.0)
    files = {fn: str(tmp_path / fn) for fn in os.listdir(tmp_path)}
    out = combine_results.combine_result_files(files)
    z = out['z']
    assert z.sizes['year'] == 2
    assert z.sizes['lead_time'] == 3  # union of [0,6,12] and [0,6]
    np.testing.assert_array_equal(z.coord_values('level'), [500, 700, 850])
    v2020 = z.sel(year='2020', model='hres', metric='RMSE')
    v2022 = z.sel(year='2022', model='hres', metric='RMSE')
    # 2020 has no level 700; 2022 has no level 850 and no 12h lead.
    assert np.isnan(np.asarray(v2020.sel(level=700).values)).all()
    assert np.isnan(np.asarray(v2022.sel(level=850).values)).all()
    lead12 = v2022.sel(
        lead_time=np.timedelta64(12, 'h').astype('timedelta64[ns]'))
    assert np.isnan(np.asarray(lead12.values)).all()
    np.testing.assert_allclose(
        np.asarray(v2020.sel(level=500).values).ravel(), [1.0, 1.0, 1.0])
    np.testing.assert_allclose(
        np.asarray(v2022.sel(level=700).values).ravel()[:2], [2.0, 2.0])

  def test_duplicate_result_files_warn(self, tmp_path, capsys):
    self._save(tmp_path, 'hres_vs_era5_64x32_2020.npz', [0], [500], 1.0)
    self._save(tmp_path, 'hres_vs_era5_64x32_2020-temporal.npz',
               [0], [500], 9.0)
    files = {fn: str(tmp_path / fn) for fn in sorted(os.listdir(tmp_path))}
    combine_results.combine_result_files(files)
    captured = capsys.readouterr().out
    assert 'WARNING: multiple result files' in captured
    assert 'hres_vs_era5_64x32_2020.npz' in captured
    assert 'hres_vs_era5_64x32_2020-temporal.npz' in captured


class TestUnaggregatedZarr:
  def _run(self, tmp_path, out_name, mesh=None, dim_to_axis=None,
           init_chunk=4, lead_chunk=2, compressor=None, zarr_format=2):
    ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
    metrics = {'rmse': deterministic.RMSE()}
    times = tc.TimeChunks(init, lead, init_time_chunk_size=init_chunk,
                          lead_time_chunk_size=lead_chunk)
    out = unaggregated.define_unaggregated_pipeline(
        metrics,
        loaders.PredictionsFromDataset(path=ppath,
                                       variables=['2m_temperature']),
        loaders.TargetsFromDataset(path=tpath,
                                   variables=['2m_temperature']),
        times, out_path=str(tmp_path / out_name),
        mesh=mesh, dim_to_axis=dim_to_axis, compressor=compressor,
        zarr_format=zarr_format)
    pl = loaders.PredictionsFromDataset(path=ppath,
                                        variables=['2m_temperature'])
    tl = loaders.TargetsFromDataset(path=tpath,
                                    variables=['2m_temperature'])
    direct = deterministic.SquaredError().compute(
        pl.load_chunk(init, lead), tl.load_chunk(init, lead))
    return out, direct['2m_temperature'], init, lead

  def test_compressed_store_roundtrip(self, tmp_path):
    out, direct, init, lead = self._run(tmp_path, 'unagg_c.zarr',
                                        compressor='blosc')
    import json as _json
    zarray = _json.load(open(os.path.join(
        out, 'SquaredError.2m_temperature', '.zarray')))
    assert zarray['compressor']['id'] == 'blosc'
    da = unaggregated.load_unaggregated(out)['SquaredError.2m_temperature']
    np.testing.assert_allclose(
        np.asarray(da.transpose(*direct.dims).values),
        np.asarray(direct.values), atol=1e-5)

  def test_v3_store_roundtrip(self, tmp_path):
    # zarr_format=3 streams the same cells into a v3 layout (zarr.json
    # nodes, c/-prefixed keys, no consolidated metadata) that the
    # self-contained v3 reader assembles identically.
    out, direct, init, lead = self._run(tmp_path, 'unagg_v3.zarr',
                                        compressor='zstd', zarr_format=3)
    import json as _json
    root = _json.load(open(os.path.join(out, 'zarr.json')))
    assert root['node_type'] == 'group'
    meta = _json.load(open(os.path.join(
        out, 'SquaredError.2m_temperature', 'zarr.json')))
    assert meta['node_type'] == 'array'
    assert [c['name'] for c in meta['codecs']] == ['bytes', 'zstd']
    assert not os.path.exists(os.path.join(out, '.zmetadata'))
    da = unaggregated.load_unaggregated(out)['SquaredError.2m_temperature']
    np.testing.assert_allclose(
        np.asarray(da.transpose(*direct.dims).values),
        np.asarray(direct.values), atol=1e-5)

  def test_v3_sharded_store_roundtrip(self, tmp_path):
    """zarr_shards packs the streamed cells into sharding_indexed shard
    objects (VERDICT r4 item 7); values match the direct computation and
    partial edge shards flush correctly at finalize."""
    ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
    metrics = {'rmse': deterministic.RMSE()}
    times = tc.TimeChunks(init, lead, init_time_chunk_size=4,
                          lead_time_chunk_size=2)
    out = unaggregated.define_unaggregated_pipeline(
        metrics,
        loaders.PredictionsFromDataset(path=ppath,
                                       variables=['2m_temperature']),
        loaders.TargetsFromDataset(path=tpath,
                                   variables=['2m_temperature']),
        times, out_path=str(tmp_path / 'unagg_sharded.zarr'),
        compressor='zstd', zarr_format=3,
        # init shards of 2 compute chunks; ragged if len(init) % 8 != 0.
        zarr_chunks={'init_time': 4}, zarr_shards={'init_time': 8})
    import json as _json
    meta = _json.load(open(os.path.join(
        out, 'SquaredError.2m_temperature', 'zarr.json')))
    (codec,) = meta['codecs']
    assert codec['name'] == 'sharding_indexed'
    assert codec['configuration']['chunk_shape'][0] == 4
    assert meta['chunk_grid']['configuration']['chunk_shape'][0] == 8
    pl = loaders.PredictionsFromDataset(path=ppath,
                                        variables=['2m_temperature'])
    tl = loaders.TargetsFromDataset(path=tpath,
                                    variables=['2m_temperature'])
    direct = deterministic.SquaredError().compute(
        pl.load_chunk(init, lead), tl.load_chunk(init, lead))[
            '2m_temperature']
    da = unaggregated.load_unaggregated(out)['SquaredError.2m_temperature']
    np.testing.assert_allclose(
        np.asarray(da.transpose(*direct.dims).values),
        np.asarray(direct.values), atol=1e-5)

  def test_sharded_requires_v3(self, tmp_path):
    ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
    with pytest.raises(ValueError, match='zarr_format=3'):
      unaggregated.define_unaggregated_pipeline(
          {'rmse': deterministic.RMSE()},
          loaders.PredictionsFromDataset(path=ppath,
                                         variables=['2m_temperature']),
          loaders.TargetsFromDataset(path=tpath,
                                     variables=['2m_temperature']),
          tc.TimeChunks(init, lead),
          out_path=str(tmp_path / 'x.zarr'),
          zarr_shards={'init_time': 8})

  def test_remote_store(self, tmp_path):
    # memory:// out_path: cells stream through fsspec like gs:// would.
    ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
    metrics = {'rmse': deterministic.RMSE()}
    times = tc.TimeChunks(init, lead, init_time_chunk_size=4,
                          lead_time_chunk_size=2)
    out = unaggregated.define_unaggregated_pipeline(
        metrics,
        loaders.PredictionsFromDataset(path=ppath,
                                       variables=['2m_temperature']),
        loaders.TargetsFromDataset(path=tpath,
                                   variables=['2m_temperature']),
        times, out_path='memory://unagg_remote.zarr', compressor='zstd')
    da = unaggregated.load_unaggregated(out)['SquaredError.2m_temperature']
    assert da.sizes['init_time'] == len(init)

  def test_zarr_store_equivalence_and_layout(self, tmp_path):
    out, direct, init, lead = self._run(tmp_path, 'unagg.zarr')
    # Standard zarr v2 layout, openable by the self-contained reader
    # (and by xarray where installed).
    assert os.path.exists(os.path.join(out, '.zmetadata'))
    assert os.path.exists(
        os.path.join(out, 'SquaredError.2m_temperature', '.zarray'))
    assembled = unaggregated.load_unaggregated(out)
    da = assembled['SquaredError.2m_temperature']
    assert da.sizes['init_time'] == len(init)
    assert da.sizes['lead_time'] == len(lead)
    np.testing.assert_allclose(
        np.asarray(da.transpose(*direct.dims).values),
        np.asarray(direct.values), atol=1e-5)
    np.testing.assert_array_equal(
        da.coord_values('init_time'), np.asarray(init, 'datetime64[ns]'))
    vt = da.coords['valid_time']
    assert vt.dims == ('init_time', 'lead_time')

  def test_zarr_ragged_tail_chunks(self, tmp_path):
    # 5 inits / chunk 2 and 4 leads / chunk 3: ragged tails both axes.
    out, direct, init, lead = self._run(
        tmp_path, 'ragged.zarr', init_chunk=2, lead_chunk=3)
    da = unaggregated.load_unaggregated(out)[
        'SquaredError.2m_temperature']
    np.testing.assert_allclose(
        np.asarray(da.transpose(*direct.dims).values),
        np.asarray(direct.values), atol=1e-5)

  def test_zarr_on_virtual_mesh(self, tmp_path):
    import jax
    devices = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = jax.sharding.Mesh(devices, ('batch', 'space'))
    out, direct, init, lead = self._run(
        tmp_path, 'mesh.zarr', mesh=mesh,
        dim_to_axis={'init_time': 'batch', 'longitude': 'space'})
    da = unaggregated.load_unaggregated(out)[
        'SquaredError.2m_temperature']
    np.testing.assert_allclose(
        np.asarray(da.transpose(*direct.dims).values),
        np.asarray(direct.values), atol=1e-5)


class TestDistributedUnaggregatedZarr:
  """Two simulated processes write disjoint cells of one zarr store."""

  def test_two_process_cells_assemble_to_full(self, tmp_path, monkeypatch):
    import jax
    from weatherbenchx_tpu.parallel import unaggregated as unagg_lib
    ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
    metrics = {'rmse': deterministic.RMSE()}
    out = str(tmp_path / 'dist.zarr')

    monkeypatch.setattr(jax, 'process_count', lambda: 2)
    synced = []
    import jax.experimental.multihost_utils as mh
    monkeypatch.setattr(mh, 'sync_global_devices',
                        lambda name: synced.append(name))
    for pi in [1, 0]:  # process 0 last: it writes consolidated metadata
      monkeypatch.setattr(jax, 'process_index', lambda pi=pi: pi)
      unagg_lib.UnaggregatedPipeline(
          metrics=metrics,
          predictions_loader=loaders.PredictionsFromDataset(
              path=ppath, variables=['2m_temperature']),
          targets_loader=loaders.TargetsFromDataset(
              path=tpath, variables=['2m_temperature']),
          times=tc.TimeChunks(init, lead, init_time_chunk_size=2,
                              lead_time_chunk_size=2),
          out_path=out, distributed=True).run()
    assert synced  # the metadata write waited on the cell barrier

    da = unagg_lib.load_unaggregated(out)['SquaredError.2m_temperature']
    pl = loaders.PredictionsFromDataset(path=ppath,
                                        variables=['2m_temperature'])
    tl = loaders.TargetsFromDataset(path=tpath,
                                    variables=['2m_temperature'])
    direct = deterministic.SquaredError().compute(
        pl.load_chunk(init, lead), tl.load_chunk(init, lead))[
            '2m_temperature']
    np.testing.assert_allclose(
        np.asarray(da.transpose(*direct.dims).values),
        np.asarray(direct.values), atol=1e-5)

  def test_distributed_shard_spanning_chunks_rejected(self, tmp_path,
                                                      monkeypatch):
    """A shard object larger than the compute chunk would span cells owned
    by different processes — no single process could assemble it."""
    import jax
    from weatherbenchx_tpu.parallel import unaggregated as unagg_lib
    ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
    monkeypatch.setattr(jax, 'process_count', lambda: 2)
    monkeypatch.setattr(jax, 'process_index', lambda: 0)
    times = tc.TimeChunks(init, lead, init_time_chunk_size=4,
                          lead_time_chunk_size=2)
    with pytest.raises(ValueError, match='zarr_shards'):
      unagg_lib.ZarrStatsStore(
          times, str(tmp_path / 'd.zarr'), distributed=True,
          zarr_format=3, zarr_shards={'init_time': 8})

  def test_shard_mode_distributed_rejected(self, tmp_path, monkeypatch):
    import jax
    from weatherbenchx_tpu.parallel import unaggregated as unagg_lib
    ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
    monkeypatch.setattr(jax, 'process_count', lambda: 2)
    monkeypatch.setattr(jax, 'process_index', lambda: 0)
    with pytest.raises(ValueError, match='zarr'):
      unagg_lib.UnaggregatedPipeline(
          metrics={'rmse': deterministic.RMSE()},
          predictions_loader=loaders.PredictionsFromDataset(
              path=ppath, variables=['2m_temperature']),
          targets_loader=loaders.TargetsFromDataset(
              path=tpath, variables=['2m_temperature']),
          times=tc.TimeChunks(init, lead),
          out_path=str(tmp_path / 'shards'), distributed=True).run()


class TestCLIUnaggregatedZarr:
  def test_flag_writes_stats_store(self, tmp_path):
    ppath, tpath, cpath, init, lead = _write_source_files(
        tmp_path, with_extras=True)
    outdir = str(tmp_path / 'results')
    run_benchmark_evaluation.main([
        '--prediction', 'hres', '--target', 'era5',
        '--resolution', '64x32', '--year', '2020',
        '--variables', '2m_temperature',
        '--time_frequency', '12',
        '--init_time_start', '2020-01-01', '--init_time_stop', '2020-01-03',
        '--lead_time_stop_days', '2', '--lead_time_frequency', '12',
        '--init_time_chunk_size', '4', '--lead_time_chunk_size', '4',
        '--output_dir', outdir, '--unaggregated_zarr',
        '--prediction_path', ppath, '--target_path', tpath,
        '--climatology_path', cpath,
    ])
    store = os.path.join(
        outdir, 'hres_vs_era5_64x32_2020-init12h_stats.zarr')
    assert os.path.exists(os.path.join(store, '.zmetadata'))
    from weatherbenchx_tpu import zarr_io
    ds = zarr_io.open_dataset_zarr(store)
    assert any(k.startswith('SquaredError.') for k in ds)


class TestSinglePassStatsSink:
  """chunk_stats_sink streams unaggregated statistics out of the SAME
  pipeline pass that accumulates the aggregated state."""

  def test_sink_store_matches_standalone_pipeline(self, tmp_path):
    from weatherbenchx_tpu import weighting
    from weatherbenchx_tpu.parallel import pipeline as pipeline_lib

    ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
    metrics = {'rmse': deterministic.RMSE()}
    times = tc.TimeChunks(init, lead, init_time_chunk_size=4,
                          lead_time_chunk_size=2)

    def mk_loaders():
      return (loaders.PredictionsFromDataset(
                  path=ppath, variables=['2m_temperature']),
              loaders.TargetsFromDataset(
                  path=tpath, variables=['2m_temperature']))

    # Single pass: aggregated eval + sink.
    pl_, tl_ = mk_loaders()
    store = unaggregated.ZarrStatsStore(
        times, str(tmp_path / 'sink.zarr'), compressor='zstd')
    agg = aggregation.Aggregator(
        reduce_dims=['init_time', 'latitude', 'longitude'],
        weigh_by=[weighting.GridAreaWeighting()])
    values = pipeline_lib.EvaluationPipeline(
        metrics=metrics, aggregator=agg,
        predictions_loader=pl_, targets_loader=tl_, times=times,
        chunk_stats_sink=store.write_chunk).run().metric_values(metrics)
    store.finalize()
    assert np.isfinite(
        np.asarray(values['rmse.2m_temperature'].values)).all()

    # Standalone unaggregated pipeline over the same inputs.
    pl2, tl2 = mk_loaders()
    out2 = unaggregated.define_unaggregated_pipeline(
        metrics, pl2, tl2, times, out_path=str(tmp_path / 'solo.zarr'))

    a = unaggregated.load_unaggregated(str(tmp_path / 'sink.zarr'))
    b = unaggregated.load_unaggregated(out2)
    assert set(a) == set(b) == {'SquaredError.2m_temperature'}
    da, db = a['SquaredError.2m_temperature'], b['SquaredError.2m_temperature']
    np.testing.assert_allclose(
        np.asarray(da.values),
        np.asarray(db.transpose(*da.dims).values), atol=1e-6)

  def test_sink_with_batched_dispatch(self, tmp_path):
    from weatherbenchx_tpu.parallel import pipeline as pipeline_lib

    ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
    metrics = {'rmse': deterministic.RMSE()}
    times = tc.TimeChunks(init, lead, init_time_chunk_size=2,
                          lead_time_chunk_size=2)
    store = unaggregated.ZarrStatsStore(
        times, str(tmp_path / 'batched.zarr'))
    pipeline_lib.EvaluationPipeline(
        metrics=metrics,
        aggregator=aggregation.Aggregator(
            reduce_dims=['init_time', 'latitude', 'longitude']),
        predictions_loader=loaders.PredictionsFromDataset(
            path=ppath, variables=['2m_temperature']),
        targets_loader=loaders.TargetsFromDataset(
            path=tpath, variables=['2m_temperature']),
        times=times, chunks_per_dispatch=2,
        chunk_stats_sink=store.write_chunk).run()
    store.finalize()
    da = unaggregated.load_unaggregated(
        str(tmp_path / 'batched.zarr'))['SquaredError.2m_temperature']
    assert da.sizes['init_time'] == len(init)
    assert np.isfinite(np.asarray(da.values)).all()


class TestZarrChunksRechunk:
  """Output store chunking decoupled from the compute chunking
  (reference beam_pipeline.py:671-677 xbeam.Rechunk zarr_chunks analog)."""

  def _run(self, tmp_path, name, init_cc, lead_cc, zarr_chunks):
    ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
    metrics = {'rmse': deterministic.RMSE()}
    times = tc.TimeChunks(init, lead, init_time_chunk_size=init_cc,
                          lead_time_chunk_size=lead_cc)
    out = unaggregated.define_unaggregated_pipeline(
        metrics,
        loaders.PredictionsFromDataset(path=ppath,
                                       variables=['2m_temperature']),
        loaders.TargetsFromDataset(path=tpath,
                                   variables=['2m_temperature']),
        times, out_path=str(tmp_path / name), zarr_chunks=zarr_chunks)
    return out, unaggregated.load_unaggregated(out)[
        'SquaredError.2m_temperature']

  @pytest.mark.parametrize('init_cc,lead_cc,zc', [
      # zarr chunks LARGER than the compute grid (incl. ragged tails on
      # both axes: 8 inits in compute chunks of 3, cells of 4; 4 leads in
      # compute chunks of 2, cells of 3).
      (3, 2, {'init_time': 4, 'lead_time': 3}),
      # zarr chunks SMALLER than (and dividing) the compute chunks.
      (4, 4, {'init_time': 2, 'lead_time': 1}),
      # not aligned in either direction: compute 3 vs output 2.
      (3, 4, {'init_time': 2}),
      # one big output chunk per axis (the year-of-init_chunk=1 fix shape).
      (1, 2, {'init_time': 8, 'lead_time': 4}),
  ])
  def test_values_match_identity_chunking(self, tmp_path, init_cc, lead_cc,
                                          zc):
    import json
    out, da = self._run(tmp_path, 'rechunked.zarr', init_cc, lead_cc, zc)
    _, ref = self._run(tmp_path, 'identity.zarr', init_cc, lead_cc, None)
    np.testing.assert_array_equal(
        np.asarray(da.values),
        np.asarray(ref.transpose(*da.dims).values))
    zarray = json.load(open(
        os.path.join(out, 'SquaredError.2m_temperature', '.zarray')))
    dims = list(da.dims)
    for d, c in zc.items():
      assert zarray['chunks'][dims.index(d)] == c, (d, zarray['chunks'])

  def test_distributed_requires_dividing_chunks(self, tmp_path):
    ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
    times = tc.TimeChunks(init, lead, init_time_chunk_size=3,
                          lead_time_chunk_size=2)
    with pytest.raises(ValueError, match='divide the compute chunk'):
      unaggregated.ZarrStatsStore(
          times, str(tmp_path / 'd.zarr'), distributed=True,
          zarr_chunks={'init_time': 4})
    # Dividing output chunks are fine under distributed ownership.
    unaggregated.ZarrStatsStore(
        times, str(tmp_path / 'ok.zarr'), distributed=True,
        zarr_chunks={'lead_time': 1})


def test_finalize_noop_on_chunkless_rerun(tmp_path):
  """A rerun that wrote no chunks must not clobber a complete store's
  consolidated metadata (checkpoint-resume of a finished run)."""
  import json
  from weatherbenchx_tpu import time_chunks as tclib

  ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
  metrics = {'rmse': deterministic.RMSE()}
  times = tc.TimeChunks(init, lead, init_time_chunk_size=4,
                        lead_time_chunk_size=2)
  out = unaggregated.define_unaggregated_pipeline(
      metrics,
      loaders.PredictionsFromDataset(path=ppath,
                                     variables=['2m_temperature']),
      loaders.TargetsFromDataset(path=tpath, variables=['2m_temperature']),
      times, out_path=str(tmp_path / 'fin.zarr'))
  before = json.load(open(os.path.join(out, '.zmetadata')))
  assert any('SquaredError' in k for k in before['metadata'])
  # Chunkless rerun: a fresh store object finalizes without writes.
  store = unaggregated.ZarrStatsStore(times, out)
  assert store.finalize() == out
  after = json.load(open(os.path.join(out, '.zmetadata')))
  assert after == before


def test_finalize_recovers_store_crashed_before_consolidation(tmp_path):
  """All cells on disk but no .zmetadata (crash between writes and
  finalize): a chunkless-rerun finalize must rebuild the consolidated
  index from the per-array metadata, not hide the data arrays."""
  import json
  ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
  metrics = {'rmse': deterministic.RMSE()}
  times = tc.TimeChunks(init, lead, init_time_chunk_size=4,
                        lead_time_chunk_size=2)
  out = unaggregated.define_unaggregated_pipeline(
      metrics,
      loaders.PredictionsFromDataset(path=ppath,
                                     variables=['2m_temperature']),
      loaders.TargetsFromDataset(path=tpath, variables=['2m_temperature']),
      times, out_path=str(tmp_path / 'crash.zarr'))
  complete = io_lib.load_dataset(out)
  os.remove(os.path.join(out, '.zmetadata'))  # simulate the crash
  store = unaggregated.ZarrStatsStore(times, out)
  assert store.finalize() == out
  meta = json.load(open(os.path.join(out, '.zmetadata')))['metadata']
  assert any('SquaredError' in k for k in meta)
  recovered = io_lib.load_dataset(out)
  assert set(recovered) == set(complete)
  for k in complete:
    np.testing.assert_array_equal(np.asarray(recovered[k].values),
                                  np.asarray(complete[k].values))


def test_load_dataset_rejects_non_zarr_directory(tmp_path):
  d = tmp_path / 'not_a_store'
  d.mkdir()
  (d / 'manifest.json').write_text('{}')
  with pytest.raises(ValueError, match='not a zarr'):
    io_lib.load_dataset(str(d))


class TestScorecardWorkflow:
  """combine_results (multi-year) -> interactive scorecard HTML."""

  def _write_results(self, tmp_path):
    regions = np.array(['global', 'tropics', 'tropics_land'])
    leads = (np.arange(0, 73, 24) * np.timedelta64(1, 'h')
             ).astype('timedelta64[ns]')
    rng = np.random.default_rng(0)
    for model in ['hres_vs_era5', 'pangu_vs_era5']:
      for year in [2018, 2020]:
        ds = {
            'rmse.geopotential': DimArray(
                rng.random((len(leads), len(regions))).astype(np.float32),
                ('lead_time', 'region'),
                {'lead_time': leads, 'region': regions}),
            'vector_rmse.wind': DimArray(
                rng.random((len(leads), len(regions))).astype(np.float32),
                ('lead_time', 'region'),
                {'lead_time': leads, 'region': regions}),
        }
        io_lib.save_dataset(
            str(tmp_path / f'{model}_64x32_{year}-init12h.npz'), ds)

  def test_multi_year_stacking_and_display_names(self, tmp_path):
    self._write_results(tmp_path)
    out = str(tmp_path / 'scorecard.npz')
    combine_results.main(['--results_dir', str(tmp_path),
                          '--output_path', out, '--display_names'])
    sc = io_lib.load_dataset(out)
    # vector_rmse.wind folded into RMSE of the Wind Vector variable.
    assert 'Wind Vector' in sc and 'Geopotential' in sc
    da = sc['Geopotential']
    assert set(da.dims) == {'model', 'metric', 'year', 'resolution',
                            'lead_time', 'region'}
    np.testing.assert_array_equal(da.coord_values('year'),
                                  ['2018', '2020'])
    np.testing.assert_array_equal(da.coord_values('model'),
                                  ['IFS HRES vs ERA5',
                                   'Pangu-Weather vs ERA5'])
    np.testing.assert_array_equal(
        da.coord_values('region'),
        ['Global', 'Tropics', 'Tropics (Land)'])
    # Values survive the stack: 2018 hres slice equals the source file.
    src = io_lib.load_dataset(
        str(tmp_path / 'hres_vs_era5_64x32_2018-init12h.npz'))
    got = da.sel(model='IFS HRES vs ERA5', metric='RMSE', year='2018',
                 resolution='64x32')
    np.testing.assert_allclose(
        np.asarray(got.transpose('lead_time', 'region').values, np.float64),
        np.asarray(src['rmse.geopotential'].values, np.float64), atol=1e-7)

  def test_interactive_html_payload(self, tmp_path):
    import json as json_lib
    import re as re_lib

    from weatherbenchx_tpu.apps import scorecard_html

    self._write_results(tmp_path)
    out = str(tmp_path / 'scorecard.npz')
    combine_results.main(['--results_dir', str(tmp_path),
                          '--output_path', out, '--display_names'])
    page = scorecard_html.render_scorecard_html(out)
    m = re_lib.search(r'const DATA = (\{.*?\});\n', page, re_lib.S)
    assert m, 'embedded DATA payload missing'
    data = json_lib.loads(m.group(1))
    assert data['years'] == ['2018', '2020']
    assert data['resolutions'] == ['64x32']
    assert data['models'] == ['IFS HRES vs ERA5', 'Pangu-Weather vs ERA5']
    rows = data['values']['Geopotential']['RMSE']['all']['Global'][
        '2018|64x32']
    assert len(rows) == 2 and len(rows[0]) == 4  # models x leads
    # The dash-app interactions are present in the page.
    for needle in ('applyRelative', 'maskLeadZero', 'seepsGuard',
                   "id=\"markers\"", "id=\"year\"", "id=\"resolution\"",
                   'units'):
      assert needle in page, needle


def test_finalize_recovers_store_never_consolidated(tmp_path):
  """Crash BEFORE the first finalize: coordinate arrays must already be on
  disk (they are written eagerly, not in finalize), so a resumed run that
  replays zero chunks can still consolidate a complete store."""
  import json
  ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
  metrics = {'rmse': deterministic.RMSE()}
  times = tc.TimeChunks(init, lead, init_time_chunk_size=4,
                        lead_time_chunk_size=2)
  out = str(tmp_path / 'nofin.zarr')
  pipe = unaggregated.UnaggregatedPipeline(
      metrics=metrics,
      predictions_loader=loaders.PredictionsFromDataset(
          path=ppath, variables=['2m_temperature']),
      targets_loader=loaders.TargetsFromDataset(
          path=tpath, variables=['2m_temperature']),
      times=times, out_path=out)
  store = unaggregated.ZarrStatsStore(times, out)
  for i, offsets, (p, t) in pipe._stream():
    store.write_chunk(i, offsets, pipe._chunk_stats(p, t))
  # No finalize: the run "crashed" here. A fresh store (a resumed run that
  # replays zero chunks) consolidates from disk.
  resumed = unaggregated.ZarrStatsStore(times, out)
  assert resumed.finalize() == out
  meta = json.load(open(os.path.join(out, '.zmetadata')))['metadata']
  for cname in ('latitude', 'longitude', 'valid_time',
                'init_time', 'lead_time'):
    assert f'{cname}/.zarray' in meta, cname
  da = unaggregated.load_unaggregated(out)['SquaredError.2m_temperature']
  assert da.sizes['init_time'] == len(init)
  assert {'latitude', 'longitude', 'valid_time'} <= set(da.coords)
  assert np.isfinite(np.asarray(da.values)).all()


def test_latency_wrapper_forwards_all_pipeline_options(tmp_path):
  """ConstantLatencyWrapper replays the load_chunk pipeline itself, so it
  must inherit EVERY pipeline option of the wrapped loader — notably the
  sparse retrace-bounding pad_index_multiple."""
  from weatherbenchx_tpu.data import latency_wrappers

  ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
  inner = loaders.PredictionsFromDataset(
      path=ppath, variables=['2m_temperature'],
      add_nan_mask=True, pad_index_multiple=64, add_values_to_coords=True)
  wrapper = latency_wrappers.ConstantLatencyWrapper(
      inner, latency=np.timedelta64(0, 'h'), nominal_init_times=init)
  assert wrapper._pad_index_multiple == 64
  assert wrapper._add_values_to_coords is True
  assert wrapper._add_nan_mask is True
  chunk = wrapper.load_chunk(init[:1], lead)
  da = chunk['2m_temperature']
  assert da.has_coord('values_as_coord')  # stage actually ran
  assert da.has_coord('mask')


class TestCLIConfigResolution:
  """Registry/flag interaction fixes (duplicate kwargs, quirk survival)."""

  def test_default_era5_target_kwargs_do_not_collide(self, tmp_path,
                                                     monkeypatch):
    """--target=era5 (the default) carries preprocessing_fn in its registry
    data_loader_kwargs; the CLI must merge with setdefault, not pass a
    second explicit preprocessing_fn (TypeError)."""
    from weatherbenchx_tpu.apps import configs as configs_lib
    from weatherbenchx_tpu.apps import run_benchmark_evaluation as rbe

    ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
    era5 = dict(configs_lib.target_configs['era5_64x32'], path=tpath)
    monkeypatch.setitem(configs_lib.target_configs, 'era5_64x32', era5)
    outdir = str(tmp_path / 'out')
    rbe.main([
        '--prediction=hres', f'--prediction_path={ppath}',
        f'--climatology_path={cpath}',  # NO --target_path: registry kwargs
        '--resolution=64x32', '--year=2020',
        '--init_time_start=2020-01-01', '--init_time_stop=2020-01-03',
        '--lead_time_stop_days=2', '--lead_time_frequency=12',
        '--variables=2m_temperature', f'--output_dir={outdir}',
    ])
    out = io_lib.load_dataset(
        os.path.join(outdir, 'hres_vs_era5_64x32_2020-init12h.npz'))
    assert np.isfinite(np.asarray(out['rmse.2m_temperature'].values)).all()

  def test_prediction_path_preserves_registry_quirks(self, tmp_path):
    """--prediction_path overrides ONLY the path: keisler's nan-mask +
    skipna aggregation must survive, or NaN model outputs silently poison
    every metric."""
    from weatherbenchx_tpu.apps import run_benchmark_evaluation as rbe

    ppath, tpath, cpath, init, lead = _write_source_files(tmp_path)
    pred = io_lib.load_dataset(ppath)
    data = np.asarray(pred['2m_temperature'].values).copy()
    data[0, 0, 3, 4] = np.nan  # a keisler-style NaN output
    pred['2m_temperature'] = pred['2m_temperature'].copy(data=data)
    ppath_nan = str(tmp_path / 'pred_nan.npz')
    io_lib.save_dataset(ppath_nan, pred)
    outdir = str(tmp_path / 'out_keisler')
    rbe.main([
        '--prediction=keisler', f'--prediction_path={ppath_nan}',
        f'--target_path={tpath}', f'--climatology_path={cpath}',
        '--resolution=64x32', '--year=2020',
        '--init_time_start=2020-01-01', '--init_time_stop=2020-01-03',
        '--lead_time_stop_days=2', '--lead_time_frequency=12',
        '--variables=2m_temperature', f'--output_dir={outdir}',
    ])
    out = io_lib.load_dataset(
        os.path.join(outdir, 'keisler_vs_era5_64x32_2020-init12h.npz'))
    assert np.isfinite(np.asarray(out['rmse.2m_temperature'].values)).all()

  def test_climatology_prediction_entries_sort_latitude(self):
    from weatherbenchx_tpu.apps import configs as configs_lib
    for key, cfg in configs_lib.climatology_configs.items():
      fn = cfg.get('data_loader_kwargs', {}).get('preprocessing_fn')
      assert fn is configs_lib.sort_latitude, key

  def test_single_member_configs_parse_any_model_name(self, monkeypatch):
    from weatherbenchx_tpu.apps import configs as configs_lib
    monkeypatch.setitem(
        configs_lib.probabilistic_prediction_configs, 'gencast_64x32_2020',
        {'path': 'x.zarr', 'variables': ['geopotential']})
    out = configs_lib.single_member_configs()
    assert 'gencast_single_member_64x32_2020' in out
    assert out['gencast_single_member_64x32_2020']['path'] == 'x.zarr'
    # Existing conventions unchanged.
    assert 'ens_single_member_64x32_2020' in out
    assert 'neuralgcm_ens_single_member_64x32_2020' in out


class TestCombineCrossModelAlignment:
  def test_models_with_different_lead_extents_outer_join(self, tmp_path):
    """hres (short leads) + fuxi-style (long leads) in one combo must
    outer-join lead_time labels like the reference's xr.merge."""
    from weatherbenchx_tpu.apps import combine_results
    from weatherbenchx_tpu.darray import Coord

    def result(leads_h, value):
      leads = np.array(leads_h, dtype='timedelta64[h]').astype(
          'timedelta64[ns]')
      return {'rmse.2m_temperature': DimArray(
          np.full(len(leads), value, np.float32), ('lead_time',),
          {'lead_time': Coord(('lead_time',), leads)})}

    a, b = str(tmp_path / 'a.npz'), str(tmp_path / 'b.npz')
    io_lib.save_dataset(a, result([0, 12, 24], 1.0))
    io_lib.save_dataset(b, result([0, 12, 24, 36, 48], 2.0))
    out = combine_results.combine_model_results({'hres': a, 'fuxi': b})
    da = out['2m_temperature']
    assert da.sizes['lead_time'] == 5
    hres = np.asarray(da.sel(model='hres', metric='RMSE').values)
    fuxi = np.asarray(da.sel(model='fuxi', metric='RMSE').values)
    np.testing.assert_array_equal(hres[:3], [1.0, 1.0, 1.0])
    assert np.isnan(hres[3:]).all()
    np.testing.assert_array_equal(fuxi, [2.0] * 5)


class TestScorecardLeadAlignment:
  def test_variables_with_different_leads_plot_on_union_axis(self, tmp_path):
    import json as json_lib
    import re as re_lib
    from weatherbenchx_tpu.apps import combine_results, scorecard_html
    from weatherbenchx_tpu.darray import Coord

    def var(leads_h, value):
      leads = np.array(leads_h, dtype='timedelta64[h]').astype(
          'timedelta64[ns]')
      return DimArray(
          np.full((1, 1, len(leads)), value, np.float32),
          ('model', 'metric', 'lead_time'),
          {'model': Coord(('model',), np.array(['hres'])),
           'metric': Coord(('metric',), np.array(['RMSE'])),
           'lead_time': Coord(('lead_time',), leads)})

    sc = {'2m_temperature': var([0, 12, 24], 1.0),
          'total_precipitation_24hr': var([24], 3.0)}
    path = str(tmp_path / 'sc.npz')
    io_lib.save_dataset(path, sc)
    html = scorecard_html.render_scorecard_html(path)
    m = re_lib.search(r'const DATA = (\{.*?\});\n', html, re_lib.DOTALL)
    data = json_lib.loads(m.group(1)) if m else None
    if data is None:  # fallback: DATA embedded differently
      m = re_lib.search(r'DATA = (\{.*\})', html)
      data = json_lib.loads(m.group(1))
    assert data['lead_hours'] == [0, 12, 24]
    precip = data['values']['total_precipitation_24hr']['RMSE']
    row = precip['all']['all']['all'][0]
    # The 24h-only value sits at the 24h column, not column 0.
    assert row == [None, None, 3.0]


class TestScorecardFigure:
  """Publication matplotlib scorecard (WB_X_Website_Scorecard.ipynb analog)."""

  def _combined_store(self, tmp_path):
    lead = np.array([1, 3, 5, 7, 10], dtype='timedelta64[D]').astype(
        'timedelta64[ns]')
    levels = np.array([500, 850])
    regions = np.array(['global'])
    rng = np.random.default_rng(0)
    base = 100 + 50 * rng.random((5, 2, 1))
    for model, scale in [('hres_vs_hres_t0', 1.0),
                         ('pangu_vs_era5', 1.2),
                         ('pangu_hres_init_vs_hres_t0', 0.9)]:
      ds = {
          'rmse.geopotential': DimArray(
              scale * base,
              ('lead_time', 'level', 'region'),
              {'lead_time': lead, 'level': levels, 'region': regions}),
          'rmse.total_precipitation_24hr': DimArray(
              np.full((5, 1), np.nan) if model.endswith('hres_t0')
              else scale * rng.random((5, 1)),
              ('lead_time', 'region'),
              {'lead_time': lead, 'region': regions}),
      }
      io_lib.save_dataset(str(tmp_path / f'{model}_64x32_2020.npz'), ds)
    out = str(tmp_path / 'scorecard.npz')
    combine_results.main(['--results_dir', str(tmp_path),
                          '--output_path', out, '--display_names'])
    return out

  def test_relative_math(self, tmp_path):
    from weatherbenchx_tpu.apps import scorecard_figure
    store = io_lib.load_dataset(self._combined_store(tmp_path))
    rel = scorecard_figure.compute_relative(store, 'IFS HRES vs Analysis')
    da = rel['Geopotential']
    ref = da.sel(model='IFS HRES vs Analysis')
    np.testing.assert_allclose(np.asarray(ref.values), 0.0, atol=1e-9)
    # pangu is 1.2x hres → +20% everywhere.
    pangu = da.sel(model='Pangu-Weather vs ERA5', metric='RMSE')
    np.testing.assert_allclose(
        np.asarray(pangu.values), 20.0, atol=1e-6)

  def test_analysis_precip_substitution(self, tmp_path):
    from weatherbenchx_tpu.apps import scorecard_figure
    store = io_lib.load_dataset(self._combined_store(tmp_path))
    # 'Pangu-Weather (oper.) vs Analysis' precip is NaN in the store; the
    # substitution has nothing to copy (no oper.-vs-ERA5 entry), so NaN
    # stays.  'IFS HRES vs Analysis' likewise.  Add the ERA5 counterpart
    # case via the plain pangu pair: rename check only.
    subst = scorecard_figure.replace_analysis_precip_with_era(store)
    da = subst['24h Precipitation']
    hres = da.sel(model='IFS HRES vs Analysis')
    assert np.isnan(np.asarray(hres.values)).all()

  def test_figure_renders(self, tmp_path):
    import matplotlib
    matplotlib.use('Agg')
    from weatherbenchx_tpu.apps import scorecard_figure
    store = self._combined_store(tmp_path)
    out = str(tmp_path / 'scorecard.png')
    scorecard_figure.main([
        '--scorecard', store, '--output', out,
        '--reference_model', 'IFS HRES vs Analysis',
        '--panels', 'Geopotential:500:RMSE,Geopotential:850:RMSE',
    ])
    assert os.path.getsize(out) > 20_000
