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


def test_bf16_optimizer_moments():
    """bf16_moments stores Adam mu in bfloat16 and updates stay close to
    the fp32-moment optimizer."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from radzero_tpu.train.optim import build_optimizer

    params = {"w": {"kernel": jnp.ones((8, 8), jnp.float32) * 0.1,
                    "bias": jnp.zeros((8,), jnp.float32)}}
    grads = jax.tree.map(lambda x: jnp.full_like(x, 0.01), params)

    tx32, _ = build_optimizer(params, total_steps=10)
    tx16, _ = build_optimizer(params, total_steps=10, bf16_moments=True)
    s32 = tx32.init(params)
    s16 = tx16.init(params)

    bf16 = jnp.dtype(jnp.bfloat16)
    dtypes16 = {l.dtype for l in jax.tree.leaves(s16) if hasattr(l, "dtype")}
    dtypes32 = {l.dtype for l in jax.tree.leaves(s32) if hasattr(l, "dtype")}
    assert bf16 in dtypes16  # mu stored in bf16
    assert bf16 not in dtypes32

    p32, p16 = params, params
    for _ in range(3):
        u32, s32 = tx32.update(grads, s32, p32)
        p32 = optax.apply_updates(p32, u32)
        u16, s16 = tx16.update(grads, s16, p16)
        p16 = optax.apply_updates(p16, u16)
    a = np.asarray(p32["w"]["kernel"])
    b = np.asarray(p16["w"]["kernel"])
    np.testing.assert_allclose(b, a, rtol=1e-2, atol=1e-5)
