from weatherbenchx_tpu.data import base
from weatherbenchx_tpu.data import loaders
