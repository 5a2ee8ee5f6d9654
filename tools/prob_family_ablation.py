"""On-chip ablation of the probabilistic full-suite family (VERDICT r4
item 5): attribute the measured ~5.8 ms/step against its composite floor
(~3.6 ms: ensemble HBM read + sort-network ops + 4-stat aggregation
loads) by timing each constituent at the EXACT production shape
(m=50 × (1, 4, 721, 1440) f32) with the same scan/latency-subtraction
method bench.py uses.

Stages (each a latency-subtracted best-of-3 scan):
  ens_read      one full HBM pass over the 830 MB ensemble (measured
                read floor, not the analytic bandwidth number)
  spread_kernel the Pallas CRPS-spread pass alone (sort form at m=50)
  fused_kernel  the fused 4-output ensemble-stats Pallas pass alone
  stats_step    compute_unique_statistics_for_all_metrics (fused pass +
                CRPS assembly + DimArray plumbing), no aggregation
  agg_only      production 34-bin masked aggregation of 4 precomputed
                stat arrays (no ensemble touch)
  full          the real ChunkEvaluator._eval_fn (stats + aggregation),
                i.e. what the bench family times

Attribution: full − (stats_step + agg_only) ≈ scheduling/fusion overlap;
stats_step − fused_kernel ≈ CRPS assembly epilogue; fused_kernel −
max(ens_read, spread_kernel) ≈ kernel cost above its own floors.

Usage: python tools/prob_family_ablation.py [--k 12] [--leads 4]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--k', type=int, default=12, help='scan iterations')
  ap.add_argument('--leads', type=int, default=4)
  ap.add_argument('--grid', default='721x1440')
  ap.add_argument('--m', type=int, default=50)
  args = ap.parse_args()

  import jax
  import jax.numpy as jnp
  from jax import lax

  try:
    jax.config.update('jax_compilation_cache_dir', '/tmp/wbx_xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
  except Exception:
    pass

  from weatherbenchx_tpu import aggregation, binning, weighting
  from weatherbenchx_tpu.apps import configs as configs_lib
  from weatherbenchx_tpu.darray import DimArray
  from weatherbenchx_tpu.metrics import base as metrics_base
  from weatherbenchx_tpu.metrics import probabilistic
  from weatherbenchx_tpu.ops import crps_pairwise
  from weatherbenchx_tpu.parallel import evaluator as evaluator_lib

  nlat, nlon = map(int, args.grid.split('x'))
  n_lead, m = args.leads, args.m
  lats = np.linspace(-90, 90, nlat)
  lons = np.linspace(0, 360, nlon, endpoint=False)
  init = np.array(['2020-01-03'], dtype='datetime64[ns]')
  leads = (np.arange(n_lead) * np.timedelta64(6, 'h')
           ).astype('timedelta64[ns]')
  base_coords = {'init_time': init, 'lead_time': leads,
                 'latitude': lats, 'longitude': lons}
  gdims = ('init_time', 'lead_time', 'latitude', 'longitude')
  gshape = (1, n_lead, nlat, nlon)

  rng = np.random.default_rng(17)
  ens_np = rng.random((m,) + gshape, dtype=np.float32)
  tgt_np = np.random.default_rng(18).random(gshape, dtype=np.float32)

  preds = {'2m_temperature': DimArray(
      ens_np, ('number',) + gdims,
      dict(base_coords, number=np.arange(m)))}
  tgts = {'2m_temperature': DimArray(tgt_np, gdims, base_coords)}
  metrics = {
      'crps': probabilistic.CRPSEnsemble(use_sort=True),
      'spread_skill': probabilistic.UnbiasedSpreadSkillRatio(),
      'unbiased_mean_rmse': probabilistic.UnbiasedEnsembleMeanRMSE(),
  }

  yy, xx = np.meshgrid(np.deg2rad(lats), np.deg2rad(lons), indexing='ij')
  land = (np.sin(3 * yy) * np.cos(4 * xx) > 0.1)
  land_da = DimArray(land, ('latitude', 'longitude'),
                     {'latitude': lats, 'longitude': lons})
  agg = aggregation.Aggregator(
      reduce_dims=['init_time', 'latitude', 'longitude'],
      bin_by=[binning.Regions(configs_lib.REGIONS,
                              land_sea_mask=land_da)],
      weigh_by=[weighting.GridAreaWeighting()],
      masked=True)

  # --- latency calibration (median of 5 trivial round trips) -----------
  tiny = jax.jit(lambda v: v + 1)
  z = jax.device_put(jnp.zeros(()))
  float(tiny(z))
  samples = []
  for i in range(5):
    t0 = time.perf_counter()
    float(tiny(z + i))
    samples.append(time.perf_counter() - t0)
  latency = sorted(samples)[len(samples) // 2]

  k = args.k

  def timed(make_scan, *dev_args):
    """Compile + best-of-3 runs of scan(ks, *dev_args); ms per step."""
    fn = jax.jit(make_scan)
    float(np.asarray(fn(jnp.arange(1.0, k + 1.0), *dev_args)).sum())
    best = float('inf')
    for rep in range(3):
      ks = jnp.arange(2.0 + rep, k + 2.0 + rep)
      t0 = time.perf_counter()
      float(np.asarray(fn(ks, *dev_args)).sum())
      best = min(best, time.perf_counter() - t0)
    return max(best - latency, 0.0) / k * 1e3

  x_dev = jax.device_put(jnp.asarray(ens_np))
  y_dev = jax.device_put(jnp.asarray(tgt_np))

  results = {}

  # 1. ensemble HBM read floor: one full pass, nothing else.
  def scan_read(ks, x):
    def step(c, kk):
      return c + jnp.sum(x * (1.0 + 1e-12 * kk)), ()
    out, _ = lax.scan(step, jnp.float32(0), ks)
    return out
  results['ens_read'] = round(timed(scan_read, x_dev), 2)

  # 2. spread kernel alone.
  def scan_spread(ks, x):
    def step(c, kk):
      s = crps_pairwise.pairwise_spread_sum(x + 1e-12 * kk)
      return c + jnp.sum(s), ()
    out, _ = lax.scan(step, jnp.float32(0), ks)
    return out
  results['spread_kernel'] = round(timed(scan_spread, x_dev), 2)

  # 3. fused 4-output pass alone.
  def scan_fused(ks, x, y):
    def step(c, kk):
      sp, sk, mean, sq = crps_pairwise.fused_ensemble_stats(
          x + 1e-12 * kk, y)
      return c + jnp.sum(sp) + jnp.sum(sk) + jnp.sum(mean) + jnp.sum(sq), ()
    out, _ = lax.scan(step, jnp.float32(0), ks)
    return out
  results['fused_kernel'] = round(timed(scan_fused, x_dev, y_dev), 2)

  # 4. the real statistics step (no aggregation).
  ev = evaluator_lib.ChunkEvaluator(metrics=metrics, aggregator=agg)
  p_prep = jax.device_put(evaluator_lib.prepare_chunk(
      preds, ev._clim_stats, is_predictions=True))
  t_prep = jax.device_put(evaluator_lib.prepare_chunk(tgts))
  ops = ev.operands_for(p_prep, t_prep)
  res = ev.resources()

  def scan_stats(ks, p, t):
    def step(c, kk):
      p_k = {name: da.copy(data=da.data + 1e-12 * kk)
             for name, da in p.items()}
      with metrics_base.device_resources(res):
        stats = metrics_base.compute_unique_statistics_for_all_metrics(
            metrics, p_k, t)
      acc = sum(jnp.sum(da.data) for sv in stats.values()
                for da in sv.values())
      return c + acc, ()
    out, _ = lax.scan(step, jnp.float32(0), ks)
    return out
  results['stats_step'] = round(timed(scan_stats, p_prep, t_prep), 2)

  # 5. aggregation of 4 precomputed stat arrays (no ensemble touch).
  with metrics_base.device_resources(res):
    stats0 = metrics_base.compute_unique_statistics_for_all_metrics(
        metrics, p_prep, t_prep)
  stats0 = {sn: {vn: da.copy(data=jax.device_put(jnp.asarray(da.data)))
                 for vn, da in sv.items()}
            for sn, sv in stats0.items()}

  def scan_agg(ks, stats):
    def step(c, kk):
      bumped = {sn: {vn: da.copy(data=da.data + 1e-12 * kk)
                     for vn, da in sv.items()}
                for sn, sv in stats.items()}
      state = agg.aggregate_statistics(bumped)
      leaf = jax.tree_util.tree_leaves(state.sum_weights)[0]
      return c + jnp.sum(leaf), ()
    out, _ = lax.scan(step, jnp.float32(0), ks)
    return out
  results['agg_only'] = round(timed(scan_agg, stats0), 2)

  # 6. the full family step (what bench.py's fam_prob measures).
  def scan_full(ks, p, t):
    def step(carry, kk):
      p_k = {name: da.copy(data=da.data + 1e-12 * kk)
             for name, da in p.items()}
      state = ev._eval_fn(p_k, t, ops, res)
      new = jax.tree_util.tree_map(
          lambda a, b: a + b if a.dtype == b.dtype else a, carry, state)
      return new, ()
    out, _ = lax.scan(step, ev._eval_fn(p, t, ops, res), ks)
    leaf = jax.tree_util.tree_leaves(out.sum_weights)[0]
    return jnp.sum(leaf)
  results['full'] = round(timed(scan_full, p_prep, t_prep), 2)

  results['latency_ms'] = round(latency * 1e3, 2)
  results['spread_form'] = crps_pairwise._spread_form(m)
  print(json.dumps({'prob_family_ablation_ms_per_step': results,
                    'shape': {'m': m, 'leads': n_lead,
                              'grid': f'{nlat}x{nlon}', 'k': k}}))


if __name__ == '__main__':
  main()
