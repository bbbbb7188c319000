from radzero_tpu.losses.mpnce import multi_positive_nce_loss
from radzero_tpu.losses.radzero_loss import init_radzero_loss, radzero_loss
