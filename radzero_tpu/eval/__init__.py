from radzero_tpu.eval.inference import Inference
from radzero_tpu.eval.registry import get_infer_dirs
