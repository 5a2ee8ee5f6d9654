from weatherbenchx_tpu.ops import conv
