"""Gradient accumulation: k micro-steps must equal one averaged update."""

import jax
import jax.numpy as jnp
import numpy as np

from radzero_tpu.models.configuration import (
    AlignConfig,
    LossConfig,
    RadZeroConfig,
    TextConfig,
    ViTConfig,
)
from radzero_tpu.models.radzero import init_radzero
from radzero_tpu.train.optim import build_optimizer, partition_params
from radzero_tpu.train.step import make_train_step

D = 32
CFG = RadZeroConfig(
    vision=ViTConfig(
        hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0,
        patch_size=14, pretrain_img_size=28, img_size=28,
    ),
    text=TextConfig(
        hidden_size=D, num_hidden_layers=1, num_attention_heads=2, intermediate_size=64,
        vocab_size=101, max_position_embeddings=40,
    ),
    align=AlignConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0),
    loss=LossConfig(hidden_dim=D),
)


def _batch(rng):
    return {
        "pixel_values": rng.standard_normal((2, 28, 28, 3)).astype(np.float32),
        "input_ids": rng.integers(3, 101, (4, 8)).astype(np.int32),
        "attention_mask": np.ones((4, 8), np.int32),
        "group_map": np.array([0, 0, 1, 1], np.int32),
        "row_mask": np.ones(4, np.float32),
    }


def test_multisteps_accumulates_before_update():
    params = init_radzero(jax.random.PRNGKey(0), CFG)
    trainable, frozen = partition_params(params, ["align_transformer", "text_model", "loss_fns"])
    tx, _ = build_optimizer(
        trainable, total_steps=100, warmup_steps=1, gradient_accumulation_steps=2
    )
    opt_state = tx.init(trainable)
    step = make_train_step(CFG, tx, dtype=jnp.float32, donate=False)

    rng = np.random.default_rng(0)
    b1, b2 = _batch(rng), _batch(rng)

    # first micro-step: params unchanged (accumulating)
    t1, s1, _ = step(trainable, frozen, opt_state, b1)
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), t1, trainable)
    assert max(jax.tree.leaves(diffs)) == 0.0

    # second micro-step completes the accumulation window -> update applied
    t2, s2, _ = step(t1, frozen, s1, b2)
    # third+fourth micro window with warmed-up lr -> params move
    t3, s3, _ = step(t2, frozen, s2, b1)
    t4, s4, _ = step(t3, frozen, s3, b2)
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), t4, t2)
    assert max(jax.tree.leaves(diffs)) > 0.0
