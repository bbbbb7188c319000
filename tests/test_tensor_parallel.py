"""Tensor-parallel sharding: 4x2 (data x model) mesh must match 1-device numerics."""

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
from radzero_tpu.parallel.mesh import create_mesh
from radzero_tpu.parallel.sharding_rules import param_shardings, shard_params
from jax.sharding import NamedSharding, PartitionSpec as P

D = 32
CFG = RadZeroConfig(
    vision=ViTConfig(
        hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0,
        patch_size=14, pretrain_img_size=28, img_size=28,
    ),
    text=TextConfig(
        hidden_size=D, num_hidden_layers=1, num_attention_heads=2, intermediate_size=64,
        vocab_size=104, max_position_embeddings=40,
    ),
    align=AlignConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0),
    loss=LossConfig(hidden_dim=D),
)


def _batch(rng, B=8):
    S = B * 2
    return {
        "pixel_values": rng.standard_normal((B, 28, 28, 3)).astype(np.float32),
        "input_ids": rng.integers(3, 104, (S, 8)).astype(np.int32),
        "attention_mask": np.ones((S, 8), np.int32),
        "group_map": np.repeat(np.arange(B), 2).astype(np.int32),
        "row_mask": np.ones(S, np.float32),
    }


def test_tp_sharding_rules_shapes():
    params = init_radzero(jax.random.PRNGKey(0), CFG)
    mesh = create_mesh({"data": 4, "model": 2})
    sh = param_shardings(params, mesh)
    attn_q = sh["vision_model"]["layers"]["attn"]["q"]["kernel"]
    assert attn_q.spec == P(None, None, "model")
    attn_o = sh["vision_model"]["layers"]["attn"]["o"]["kernel"]
    assert attn_o.spec == P(None, "model", None)
    fc2 = sh["text_model"]["layers"]["mlp"]["fc2"]["kernel"]
    assert fc2.spec == P(None, "model", None)
    word = sh["text_model"]["embeddings"]["word"]
    assert word.spec == P("model", None)
    # LN replicated
    assert sh["vision_model"]["final_ln"]["scale"].spec == P()


def test_tp_loss_matches_replicated():
    params = init_radzero(jax.random.PRNGKey(0), CFG)
    batch = _batch(np.random.default_rng(0))
    ref = float(forward_train(params, CFG, batch)["losses"]["loss"])

    mesh = create_mesh({"data": 4, "model": 2})
    sp = shard_params(params, mesh)
    sb = {
        k: jax.device_put(v, NamedSharding(mesh, P("data")))
        for k, v in batch.items()
    }
    out = jax.jit(lambda p, b: forward_train(p, CFG, b)["losses"]["loss"])(sp, sb)
    np.testing.assert_allclose(float(out), ref, rtol=3e-5)
