"""apache_beam.testing subpackage (shim)."""
