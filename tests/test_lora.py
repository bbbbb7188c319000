"""LoRA tests: identity at init, targeting, gradient flow to adapters only."""

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
from radzero_tpu.models.radzero import forward_train, init_radzero
from radzero_tpu.train.lora import init_lora, merge_lora, with_trainable, lora_trainable

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


def test_lora_identity_at_init():
    params = init_radzero(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), params, ["attn/q", "attn/v"], r=4)
    assert lora["adapters"], "no kernels targeted"
    merged = merge_lora(params, lora)
    batch = _batch(np.random.default_rng(0))
    l0 = float(forward_train(params, CFG, batch)["losses"]["loss"])
    l1 = float(forward_train(merged, CFG, batch)["losses"]["loss"])
    np.testing.assert_allclose(l0, l1, rtol=1e-6)


def test_lora_targets_stacked_and_plain_kernels():
    params = init_radzero(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), params, ["attn/q"], r=4)
    # targeted in every tower: vision (stacked), align (stacked), text (stacked)
    keys = list(lora["adapters"])
    assert any(k.startswith("vision_model") for k in keys)
    assert any(k.startswith("align_transformer") for k in keys)
    assert any(k.startswith("text_model") for k in keys)
    for k, ab in lora["adapters"].items():
        assert ab["a"].ndim == 3 and ab["b"].ndim == 3  # per-layer adapters


def test_lora_gradients_flow_and_change_output():
    params = init_radzero(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), params, ["attn/q", "mlp/fc1"], r=2)
    batch = _batch(np.random.default_rng(1))

    def loss_fn(trainable):
        merged = merge_lora(params, with_trainable(lora, trainable))
        return forward_train(merged, CFG, batch)["losses"]["loss"]

    grads = jax.grad(loss_fn)(lora_trainable(lora))
    gb = [np.abs(np.asarray(g["b"])).max() for g in grads["adapters"].values()]
    assert max(gb) > 0  # b receives gradient (a's grad is 0 at init since b=0)

    # perturbing b changes the loss
    pert = jax.tree.map(lambda x: x + 0.1, lora_trainable(lora))
    l0 = float(loss_fn(lora_trainable(lora)))
    l1 = float(loss_fn(pert))
    assert abs(l0 - l1) > 1e-6


def test_lora_adapter_save_load(tmp_path):
    from radzero_tpu.train.lora import load_adapter, save_adapter

    params = init_radzero(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), params, ["attn/q"], r=4, alpha=16)
    # give adapters nonzero content
    lora["adapters"] = jax.tree.map(lambda x: x + 0.5, lora["adapters"])
    save_adapter(lora, str(tmp_path / "adapter"))

    fresh = init_lora(jax.random.PRNGKey(2), params, ["attn/q"], r=4, alpha=16)
    restored = load_adapter(str(tmp_path / "adapter"), fresh)
    assert restored["r"] == 4 and restored["alpha"] == 16
    for k in lora["adapters"]:
        np.testing.assert_allclose(
            np.asarray(restored["adapters"][k]["a"]), np.asarray(lora["adapters"][k]["a"])
        )
