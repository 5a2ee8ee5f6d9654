"""TestPipeline shim: the eager Pipeline already runs at construction.

Reference usage: ``with test_pipeline.TestPipeline() as root:``
(``beam_pipeline_test.py:135``) — by the time the context exits every
transform has executed, so exit is a no-op.
"""

from apache_beam import Pipeline


class TestPipeline(Pipeline):
  pass
