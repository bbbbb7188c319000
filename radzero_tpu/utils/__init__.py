from radzero_tpu.utils.json_io import load_json, save_json
from radzero_tpu.utils.logging import load_logger, set_logger_file
from radzero_tpu.utils.registry import Registry
