"""Accessor classes exposed for isinstance checks (reference binning.py:376)."""

from .. import DatetimeAccessor, TimedeltaAccessor  # noqa: F401
