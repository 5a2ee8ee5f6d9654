"""xarray.ufuncs shim: numpy ufuncs routed through DataArray.__array_ufunc__."""

import numpy as np

abs = np.abs  # pylint: disable=redefined-builtin
isnan = np.isnan
isfinite = np.isfinite
log = np.log
log2 = np.log2
log10 = np.log10
exp = np.exp
sqrt = np.sqrt
sin = np.sin
cos = np.cos
tan = np.tan
arcsin = np.arcsin
arccos = np.arccos
arctan2 = np.arctan2
maximum = np.maximum
minimum = np.minimum
logical_and = np.logical_and
logical_or = np.logical_or
logical_not = np.logical_not
sign = np.sign
floor = np.floor
ceil = np.ceil
