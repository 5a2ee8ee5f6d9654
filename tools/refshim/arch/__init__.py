"""Minimal stand-in for the ``arch`` package (parity-harness only).

The upstream reference imports ``arch.bootstrap.optimal_block_length``
(reference ``statistical_inference/bootstrap.py:20,426``); the real
dependency is not installed here. This stub provides exactly that one
function, backed by this repo's Politis-White port
(``weatherbenchx_tpu/inference/block_length.py``), so both frameworks run
the identical block-length selection algorithm on their own inputs.
"""

from . import bootstrap  # noqa: F401
