from radzero_tpu.config.config import Config, load_config, update_nested_dict
