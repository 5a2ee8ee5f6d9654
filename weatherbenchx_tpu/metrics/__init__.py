from weatherbenchx_tpu.metrics import base
