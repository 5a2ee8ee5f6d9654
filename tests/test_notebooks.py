"""Executed how-to notebooks: present, parseable, error-free, with outputs.

The notebooks are generated+executed by tools/make_notebooks.py (the
executable counterpart of the reference's docs/source/how_to/*.ipynb).
This test guards the committed artifacts; regenerating is a dev step.
"""

import glob
import os

import pytest

nbformat = pytest.importorskip('nbformat')

DOCS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'docs', 'notebooks')

EXPECTED = ['quickstart', 'data_loaders', 'implement_metrics',
            'metric_wrappers', 'nan_handling', 'sparse_data',
            'forecast_latency']


class TestNotebooks:

  def test_all_topics_present(self):
    have = {os.path.basename(p)[:-6]
            for p in glob.glob(os.path.join(DOCS, '*.ipynb'))}
    assert set(EXPECTED) <= have, sorted(set(EXPECTED) - have)

  @pytest.mark.parametrize('name', EXPECTED)
  def test_executed_without_errors(self, name):
    nb = nbformat.read(os.path.join(DOCS, f'{name}.ipynb'), as_version=4)
    code_cells = [c for c in nb.cells if c.cell_type == 'code']
    assert code_cells
    errors = [o for c in code_cells for o in c.outputs
              if o.output_type == 'error']
    assert not errors, errors[0]
    with_output = [c for c in code_cells if c.outputs]
    assert with_output, f'{name}: no executed outputs committed'
