"""Post-hoc statistical inference on a saved AggregationState.

The reference workflow (``statistical_inference/``): run the pipeline with
init_time preserved (the experimental unit), save the state, then compute
point estimates, confidence intervals, and a paired baseline comparison.

Run: python examples/significance_testing.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

if '--cpu' in sys.argv:  # fast local run without an accelerator
  import jax
  jax.config.update('jax_platforms', 'cpu')

import tempfile

import numpy as np

from weatherbenchx_tpu import aggregation, weighting
from weatherbenchx_tpu import time_chunks as tc
from weatherbenchx_tpu.darray import DimArray
from weatherbenchx_tpu.data import loaders
from weatherbenchx_tpu.inference import baseline_comparison, t_test
from weatherbenchx_tpu.metrics import deterministic
from weatherbenchx_tpu.parallel import pipeline as pipeline_lib

rng = np.random.default_rng(0)
lats = np.linspace(-90, 90, 19)
lons = np.linspace(0, 360, 36, endpoint=False)
init = np.datetime64('2020-01-01', 'ns') + np.arange(40) * np.timedelta64(
    12, 'h')
lead = np.array([12], 'timedelta64[h]').astype('timedelta64[ns]')
valid = np.datetime64('2020-01-01', 'ns') + np.arange(41) * np.timedelta64(
    12, 'h')

tgt = {'t2m': DimArray(
    rng.standard_normal((41, 19, 36)).astype(np.float32),
    ('valid_time', 'latitude', 'longitude'),
    {'valid_time': valid, 'latitude': lats, 'longitude': lons})}


def run_model(noise_scale):
  pred = {'t2m': DimArray(
      (noise_scale * rng.standard_normal((40, 1, 19, 36))).astype(
          np.float32),
      ('init_time', 'lead_time', 'latitude', 'longitude'),
      {'init_time': init, 'lead_time': lead,
       'latitude': lats, 'longitude': lons})}
  pipe = pipeline_lib.EvaluationPipeline(
      metrics=metrics,
      aggregator=aggregation.Aggregator(
          reduce_dims=['latitude', 'longitude'],  # init_time preserved
          weigh_by=[weighting.GridAreaWeighting()]),
      predictions_loader=loaders.PredictionsFromDataset(
          ds=pred, rename_dimensions=None),
      targets_loader=loaders.TargetsFromDataset(
          ds=tgt, rename_dimensions=None),
      times=tc.TimeChunks(init, lead, init_time_chunk_size=8))
  return pipe.run().sum_along_dims(['lead_time'])


metrics = {'rmse': deterministic.RMSE()}
state_main = run_model(noise_scale=1.0)       # "my model"
state_base = run_model(noise_scale=1.3)       # worse baseline

# States serialize losslessly; inference runs on the loaded artifact.
path = tempfile.mktemp(suffix='.npz')
state_main.save(path)
state_main = aggregation.AggregationState.load(path)

inf = t_test.GeerAR2Corrected(metrics, state_main,
                              experimental_unit_dim='init_time')
pe = inf.point_estimates()['rmse']['t2m']
lo, hi = inf.confidence_intervals(0.05)  # alpha = miscoverage: 95% CI
print(f"rmse = {float(np.asarray(pe.values)):.4f}  95% CI = "
      f"[{float(np.asarray(lo['rmse']['t2m'].values)):.4f}, "
      f"{float(np.asarray(hi['rmse']['t2m'].values)):.4f}]")

# Paired comparison vs the baseline: is the difference significant?
paired = t_test.IID.for_baseline_comparison(
    metrics, state_main, state_base, experimental_unit_dim='init_time')
p = paired.p_values()['rmse']['t2m']
sig = paired.significance_tests(0.05)['rmse']['t2m']
print(f"rmse difference vs baseline: p = {float(np.asarray(p.values)):.2e} "
      f"significant at 5%: {bool(np.asarray(sig.values))}")
