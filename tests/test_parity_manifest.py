"""Coverage manifest for the reference-parity harness.

Enumerates every public class in the upstream reference's user-facing
modules (by parsing the reference sources — no imports needed) and asserts
each one is exercised by ``tests/test_reference_parity.py``:

- ``direct``: the class name itself is instantiated/referenced in the
  parity file (checked literally, word-bounded).
- ``('via', token)``: the class is a constituent of a covered construct —
  e.g. ``CRPSSkill``/``CRPSSpread`` are the statistics behind the covered
  ``CRPSEnsemble`` metric; ``token`` must appear in the parity file.
- ``abstract``: an abstract/base class; must have at least one non-abstract
  subclass (within the scanned modules) that is itself covered.

The manifest's keys must exactly equal the discovered class set, so adding
a class upstream — or forgetting one here — fails loudly.
"""

import ast
import os
import pathlib
import re

import pytest

REFERENCE_ROOT = os.environ.get('WBX_REFERENCE_ROOT', '/root/reference')
PARITY_FILE = pathlib.Path(__file__).resolve().parent / (
    'test_reference_parity.py')

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, 'weatherbenchX')),
    reason='upstream reference tree not available')

MODULES = [
    'metrics/deterministic.py',
    'metrics/probabilistic.py',
    'metrics/categorical.py',
    'metrics/spatial.py',
    'metrics/wrappers.py',
    'metrics/base.py',
    'binning.py',
    'weighting.py',
    'interpolations.py',
    'aggregation.py',
    'data_loaders/base.py',
    'data_loaders/xarray_loaders.py',
    'data_loaders/sparse_parquet.py',
    'data_loaders/latency_wrappers.py',
    'statistical_inference/base.py',
    'statistical_inference/autodiff.py',
    'statistical_inference/t_test.py',
    'statistical_inference/bootstrap.py',
    'statistical_inference/baseline_comparison.py',
]

# class name -> coverage claim. 'direct' / ('via', token) / 'abstract'.
MANIFEST = {
    # metrics/deterministic.py
    'RelativeIntensity': 'direct',
    'Error': ('via', 'Bias'),              # Bias is the Error statistic
    'AbsoluteError': ('via', 'MAE'),       # MAE is the AbsoluteError stat
    'SquaredError': 'direct',
    'PredictionPassthrough': 'direct',
    'TargetPassthrough': 'direct',
    'WindVectorSquaredError': ('via', 'WindVectorRMSE'),
    'SquaredPredictionAnomaly': ('via', 'PredictionActivity'),
    'SquaredTargetAnomaly': ('via', 'ACC'),
    'AnomalyCovariance': ('via', 'ACC'),
    'ErrorExceedance': 'direct',
    'RMSE': 'direct',
    'WindVectorRMSE': 'direct',
    'ACC': 'direct',
    'PredictionActivity': 'direct',
    # metrics/probabilistic.py
    'EnsembleAveragedStatistic': ('via', 'EnsembleAveragedMetric'),
    'EnsembleAveragedMetric': 'direct',
    'CRPSSkill': ('via', 'CRPSEnsemble'),
    'CRPSSpread': ('via', 'CRPSEnsemble'),
    'EnsembleVariance': ('via', 'UnbiasedSpreadSkillRatio'),
    'UnbiasedEnsembleMeanSquaredError': ('via', 'UnbiasedEnsembleMeanRMSE'),
    'EnsembleRankedProbabilityScore': 'direct',
    'CRPSEnsemble': 'direct',
    'CRPSEnsembleDistance': 'direct',
    'WassersteinDistance': 'direct',
    'EnsembleErrorExceedance': 'direct',
    'UnbiasedEnsembleMeanRMSE': 'direct',
    'UnbiasedSpreadSkillRatio': 'direct',
    'EnsembleRootMeanVariance': 'direct',
    'RelativeEconomicValue': 'direct',
    'RankHistogram': 'direct',
    # metrics/categorical.py
    'TruePositives': ('via', 'CSI'),
    'TrueNegatives': ('via', 'Accuracy'),
    'FalsePositives': ('via', 'FalseAlarmRate'),
    'FalseNegatives': ('via', 'Recall'),
    'SEEPS': 'direct',
    'RankedProbabilityScore': 'direct',
    'CSI': 'direct',
    'Accuracy': 'direct',
    'Recall': 'direct',
    'FalseAlarmRate': 'direct',
    'Precision': 'direct',
    'F1Score': 'direct',
    'FrequencyBias': 'direct',
    'HSS': 'direct',
    'ETS': 'direct',
    'SEDI': 'direct',
    'Reliability': 'direct',
    'Confident': ('via', 'Opportunism'),   # is_confident flag
    'Covered': ('via', 'Opportunism'),     # is_covered flag
    'JaccardDistant': ('via', 'Opportunism'),  # is_jaccard_distant flag
    'Opportunism': 'direct',
    # metrics/spatial.py
    'SquaredFractionsError': ('via', 'FSS'),
    'SquaredPredictionFraction': ('via', 'FSS'),
    'SquaredTargetFraction': ('via', 'FSS'),
    'FSS': 'direct',
    # metrics/wrappers.py
    'InputTransform': 'abstract',
    'EnsembleMean': 'direct',
    'EnsembleQuantiles': 'direct',
    'ContinuousToBinary': 'direct',
    'ContinuousToBins': 'direct',
    'ContinuousToCDF': 'direct',
    'WeibullEnsembleToProbabilistic': 'direct',
    'Inline': 'direct',
    'ReLU': 'direct',
    'ShiftAlongNewDim': 'direct',
    'Rename': 'direct',
    'Select': 'direct',
    'StackToNewDimension': 'direct',
    'WrappedStatistic': 'direct',
    'RenamedStatistic': 'direct',
    'WrappedMetric': 'direct',
    'SubselectVariablesForStatistic': 'direct',
    'SubselectVariables': 'direct',
    # metrics/base.py
    'Metric': 'abstract',
    'Statistic': 'abstract',
    'PerVariableStatistic': 'abstract',
    'PerVariableMetric': 'abstract',
    'PerVariableStatisticWithClimatology': 'abstract',
    # binning.py
    'Binning': 'abstract',
    'LandSea': 'direct',
    'Regions': 'direct',
    'LatitudeBins': 'direct',
    'LongitudeBins': 'direct',
    'ByExactCoord': 'direct',
    'ByTimeUnit': 'direct',
    'ByTimeUnitSets': 'direct',
    'ByTimeUnitFromSeconds': 'direct',
    'ByCoordBins': 'direct',
    'BySets': 'direct',
    # weighting.py
    'Weighting': 'abstract',
    'GridAreaWeighting': 'direct',
    # interpolations.py
    'Interpolation': 'abstract',
    'MultipleInterpolation': 'direct',
    'CropToBox': 'direct',
    'InterpolateToFixedCoords': 'direct',
    'InterpolateToReferenceCoords': 'direct',
    'GridToSparseWithAltitudeAdjustment': 'direct',
    'NeighborhoodThresholdProbabilities': 'direct',
    'Subsample': 'direct',
    # aggregation.py
    'AggregationState': 'direct',
    'Aggregator': 'direct',
    # data_loaders/base.py
    'DataLoader': 'abstract',
    # data_loaders/xarray_loaders.py
    'XarrayDataLoader': 'abstract',
    'PredictionsFromXarray': 'direct',
    'TargetsFromXarray': 'direct',
    'ClimatologyFromXarray': 'direct',
    'PersistenceFromXarray': 'direct',
    'ProbabilisticClimatologyFromXarray': 'direct',
    # data_loaders/sparse_parquet.py
    'SparseObservationsFromParquet': 'direct',
    'METARFromParquet': 'direct',
    # data_loaders/latency_wrappers.py
    'ConstantLatencyWrapper': 'abstract',
    'XarrayConstantLatencyWrapper': 'direct',
    'MultipleConstantLatencyWrapper': 'direct',
    # statistical_inference/base.py
    'StatisticalInferenceMethod': 'abstract',
    # statistical_inference/t_test.py
    'IID': 'direct',
    'GeerAR2Corrected': 'direct',
    'LazarusHACEWC': 'direct',
    # statistical_inference/bootstrap.py
    'Bootstrap': 'abstract',
    'IIDBootstrap': 'direct',
    'ClusterBootstrap': 'direct',
    'StationaryBootstrap': 'direct',
    # statistical_inference/baseline_comparison.py
    # Constructed internally by the covered for_baseline_comparison path.
    'BaselineComparison': ('via', 'for_baseline_comparison'),
}


def _discover():
  """Parses reference modules: {class_name: [base_names]} for public classes."""
  classes = {}
  for mod in MODULES:
    path = pathlib.Path(REFERENCE_ROOT) / 'weatherbenchX' / mod
    tree = ast.parse(path.read_text())
    for node in tree.body:
      if isinstance(node, ast.ClassDef) and not node.name.startswith('_'):
        bases = []
        for b in node.bases:
          if isinstance(b, ast.Name):
            bases.append(b.id)
          elif isinstance(b, ast.Attribute):
            bases.append(b.attr)
        classes[node.name] = bases
  return classes


def _word_in(token, text):
  return re.search(r'\b%s\b' % re.escape(token), text) is not None


def test_manifest_matches_reference_class_set():
  discovered = set(_discover())
  claimed = set(MANIFEST)
  assert discovered == claimed, (
      f'reference classes without a manifest entry: '
      f'{sorted(discovered - claimed)}\n'
      f'manifest entries with no reference class: '
      f'{sorted(claimed - discovered)}')


def test_every_class_is_exercised_by_the_parity_harness():
  text = PARITY_FILE.read_text()
  problems = []
  for name, claim in MANIFEST.items():
    if claim == 'direct':
      if not _word_in(name, text):
        problems.append(f'{name}: claimed direct but absent from parity file')
    elif isinstance(claim, tuple) and claim[0] == 'via':
      if not _word_in(claim[1], text):
        problems.append(
            f'{name}: covering token {claim[1]!r} absent from parity file')
  assert not problems, '\n'.join(problems)


def test_abstract_classes_have_a_covered_subclass():
  classes = _discover()
  text = PARITY_FILE.read_text()

  def covered(name):
    claim = MANIFEST.get(name)
    if claim == 'direct':
      return _word_in(name, text)
    if isinstance(claim, tuple):
      return _word_in(claim[1], text)
    return False

  problems = []
  for name, claim in MANIFEST.items():
    if claim != 'abstract':
      continue
    subclasses = {c for c, bases in classes.items() if name in bases}
    # Walk transitively (e.g. PerVariableStatistic -> SquaredError).
    frontier = set(subclasses)
    while frontier:
      nxt = {c for c, bases in classes.items()
             if set(bases) & frontier} - subclasses
      subclasses |= nxt
      frontier = nxt
    if not any(covered(c) for c in subclasses):
      problems.append(f'{name}: no covered subclass among {sorted(subclasses)}')
  assert not problems, '\n'.join(problems)
