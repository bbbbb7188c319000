from radzero_tpu.models.configuration import (
    AlignConfig,
    LossConfig,
    RadZeroConfig,
    TextConfig,
    ViTConfig,
    radzero_config_from_dict,
)
from radzero_tpu.models.radzero import (
    compute_logits,
    forward_text,
    forward_train,
    forward_vision,
    init_radzero,
)
