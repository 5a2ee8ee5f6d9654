"""Minimal eager ("direct-runner") apache_beam emulation for the refshim.

Just enough Beam API for the reference's ``beam_pipeline.py`` /
``beam_utils.py`` / ``beam_pipeline_test.py`` to execute UNMODIFIED
in-process (reference ``beam_pipeline.py:23``, ``beam_utils.py:21``,
``beam_pipeline_test.py:17``), so the upstream authors' own pipeline tests
run under ``tests/test_upstream_suite.py`` like the rest of their suite.

Semantics:

- A ``PCollection`` is a materialized Python list; every transform is
  applied EAGERLY at pipeline-construction time. ``with TestPipeline() as
  p: define_pipeline(p, ...)`` has therefore already executed by the time
  the context exits, which matches what the test observes (results on
  disk after the ``with`` block).
- Branching works naturally: applying two transforms to the same
  PCollection (as ``define_pipeline`` does for the metrics and
  aggregation-state outputs) reads the same element list twice.
- ``CombinePerKey`` deliberately splits each key's inputs into two bundles
  and routes them through ``merge_accumulators``, so the reference
  ``CombiningSum``'s merge path (``beam_utils.py:43-47``) is exercised the
  way a real distributed runner would.
- ``DoFn.setup`` is invoked once per ParDo application, mirroring Beam's
  once-per-worker contract in this single-worker runner.

Anything outside this surface raises instead of guessing — the refshim
ground rule, so an upstream pass can never come from silently-wrong shim
behavior.
"""

from __future__ import annotations

import types


class PCollection:
  """A materialized PCollection: just a list plus the ``|`` operator."""

  def __init__(self, elements):
    self.elements = list(elements)

  def __or__(self, transform):
    return _apply(transform, self)

  # beam.PCollection[...] type annotations are evaluated at class-definition
  # time in the reference (no `from __future__ import annotations` there).
  def __class_getitem__(cls, item):
    return cls


class _PBegin(PCollection):
  """The pipeline root pseudo-collection (only Create applies to it)."""


def _apply(transform, pcoll):
  if isinstance(transform, PTransform):
    out = transform.expand(pcoll)
    if not isinstance(out, PCollection):
      raise TypeError(
          f'{type(transform).__name__}.expand returned {type(out).__name__}, '
          'expected PCollection')
    return out
  raise TypeError(f'cannot apply {transform!r} to a PCollection')


class PTransform:
  """Base transform. Supports Beam's ``'Label' >> transform`` idiom."""

  label = None

  def __rrshift__(self, label):
    self.label = label
    return self

  def expand(self, pcoll):
    raise NotImplementedError(
        f'{type(self).__name__}.expand is not implemented in the beam shim')


class Pipeline:
  """Eager pipeline: ``root | Create(...)`` starts a materialized chain."""

  def __init__(self, *args, **kwargs):
    del args, kwargs

  def __or__(self, transform):
    return _apply(transform, _PBegin([]))

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    return False

  def run(self):
    return _PipelineResult()


class _PipelineResult:

  def wait_until_finish(self):
    return None


class DoFn:
  """Base DoFn with Beam's no-op lifecycle defaults."""

  def setup(self):
    pass

  def start_bundle(self):
    pass

  def finish_bundle(self):
    pass

  def teardown(self):
    pass

  def process(self, element, *args, **kwargs):
    raise NotImplementedError


class Create(PTransform):

  def __init__(self, values):
    self._values = list(values)

  def expand(self, pcoll):
    if not isinstance(pcoll, _PBegin):
      raise TypeError('Create must be applied to the pipeline root')
    return PCollection(self._values)


class ParDo(PTransform):

  def __init__(self, fn, *args, **kwargs):
    if not isinstance(fn, DoFn):
      raise TypeError(f'ParDo expects a DoFn, got {type(fn).__name__}')
    self._fn = fn
    self._args = args
    self._kwargs = kwargs

  def expand(self, pcoll):
    fn = self._fn
    fn.setup()
    fn.start_bundle()
    out = []
    for element in pcoll.elements:
      result = fn.process(element, *self._args, **self._kwargs)
      if result is not None:
        out.extend(result)
    fn.finish_bundle()
    fn.teardown()
    return PCollection(out)


class Map(PTransform):

  def __init__(self, fn, *args, **kwargs):
    self._fn = fn
    self._args = args
    self._kwargs = kwargs

  def expand(self, pcoll):
    return PCollection(
        [self._fn(el, *self._args, **self._kwargs) for el in pcoll.elements])


class MapTuple(PTransform):
  """Beam's MapTuple: the element tuple is splatted into the callable."""

  def __init__(self, fn, *args, **kwargs):
    self._fn = fn
    self._args = args
    self._kwargs = kwargs

  def expand(self, pcoll):
    return PCollection(
        [self._fn(*el, *self._args, **self._kwargs) for el in pcoll.elements])


class FlatMap(PTransform):

  def __init__(self, fn, *args, **kwargs):
    self._fn = fn
    self._args = args
    self._kwargs = kwargs

  def expand(self, pcoll):
    out = []
    for el in pcoll.elements:
      out.extend(self._fn(el, *self._args, **self._kwargs))
    return PCollection(out)


class GroupByKey(PTransform):

  def expand(self, pcoll):
    grouped = {}
    for key, value in pcoll.elements:
      grouped.setdefault(key, []).append(value)
    return PCollection(list(grouped.items()))


class Values(PTransform):

  def expand(self, pcoll):
    return PCollection([value for _key, value in pcoll.elements])


class Keys(PTransform):

  def expand(self, pcoll):
    return PCollection([key for key, _value in pcoll.elements])


class CombineFn:
  """Base CombineFn (create/add/merge/extract contract)."""

  def create_accumulator(self):
    raise NotImplementedError

  def add_input(self, accumulator, element):
    raise NotImplementedError

  def merge_accumulators(self, accumulators):
    raise NotImplementedError

  def extract_output(self, accumulator):
    raise NotImplementedError


class CombinePerKey(PTransform):
  """Per-key combine that exercises the CombineFn's merge path.

  Each key's inputs are split into two bundles with separately-built
  accumulators which are then merged — the minimal faithful model of a
  distributed runner, and the only way the reference ``CombiningSum``'s
  ``merge_accumulators`` (``beam_utils.py:43-47``) gets covered.
  """

  def __init__(self, fn):
    if not isinstance(fn, CombineFn):
      raise TypeError(
          f'CombinePerKey expects a CombineFn, got {type(fn).__name__}')
    self._fn = fn

  def expand(self, pcoll):
    grouped = {}
    for key, value in pcoll.elements:
      grouped.setdefault(key, []).append(value)
    fn = self._fn
    out = []
    for key, values in grouped.items():
      mid = (len(values) + 1) // 2
      accumulators = []
      for bundle in (values[:mid], values[mid:]):
        acc = fn.create_accumulator()
        for value in bundle:
          acc = fn.add_input(acc, value)
        accumulators.append(acc)
      merged = fn.merge_accumulators(accumulators)
      out.append((key, fn.extract_output(merged)))
    return PCollection(out)


class _ToList(PTransform):

  def expand(self, pcoll):
    return PCollection([list(pcoll.elements)])


class _Distribution:
  """Metrics sink: accepts updates, keeps simple moments for inspection."""

  def __init__(self, namespace, name):
    self.namespace = namespace
    self.name = name
    self.count = 0
    self.sum = 0.0

  def update(self, value):
    self.count += 1
    self.sum += value


class _Counter(_Distribution):

  def inc(self, n=1):
    self.count += n


class _Metrics:
  _distributions: dict = {}
  _counters: dict = {}

  @classmethod
  def distribution(cls, namespace, name):
    return cls._distributions.setdefault(
        (namespace, name), _Distribution(namespace, name))

  @classmethod
  def counter(cls, namespace, name):
    return cls._counters.setdefault(
        (namespace, name), _Counter(namespace, name))


# Submodule-shaped namespaces (`beam.metrics.Metrics`, `beam.combiners`,
# `beam.transforms.CombineFn`) — attribute access only, which is all the
# reference uses.
metrics = types.SimpleNamespace(Metrics=_Metrics)
combiners = types.SimpleNamespace(ToList=_ToList)
transforms = types.SimpleNamespace(
    CombineFn=CombineFn, PTransform=PTransform, DoFn=DoFn)

__version__ = '2.64.0+wbx-refshim'
