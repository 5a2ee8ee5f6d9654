from weatherbenchx_tpu.parallel import evaluator
from weatherbenchx_tpu.parallel import pipeline
