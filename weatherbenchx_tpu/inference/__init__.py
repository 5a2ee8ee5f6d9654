from weatherbenchx_tpu.inference import autodiff
from weatherbenchx_tpu.inference import base
from weatherbenchx_tpu.inference import baseline_comparison
from weatherbenchx_tpu.inference import bootstrap
from weatherbenchx_tpu.inference import t_test
from weatherbenchx_tpu.inference import utils
