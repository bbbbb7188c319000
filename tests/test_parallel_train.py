"""Distributed-training tests on the virtual 8-device CPU mesh.

Validates the TPU-native replacement for the reference's DDP +
differentiable all_gather (SURVEY.md §2.3): a sharded global-view train
step must produce bit-comparable losses and updates to the unsharded
computation, and the frozen vision tower must not move.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radzero_tpu.models.configuration import (
    AlignConfig,
    LossConfig,
    RadZeroConfig,
    TextConfig,
    ViTConfig,
)
from radzero_tpu.models.radzero import forward_train, init_radzero
from radzero_tpu.parallel.mesh import batch_sharding, create_mesh, replicated_sharding
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


def _batch(rng, B=8, S_per=2, L=8):
    S = B * S_per
    group = np.repeat(np.arange(B), S_per).astype(np.int32)
    mask = np.ones(S, np.float32)
    mask[3] = 0.0  # one padded slot
    return {
        "pixel_values": rng.standard_normal((B, 28, 28, 3)).astype(np.float32),
        "input_ids": rng.integers(3, 101, (S, L)).astype(np.int32),
        "attention_mask": np.ones((S, L), np.int32),
        "group_map": group,
        "row_mask": mask,
    }


@pytest.fixture(scope="module")
def setup():
    params = init_radzero(jax.random.PRNGKey(0), CFG)
    trainable, frozen = partition_params(
        params, ["align_transformer", "text_model", "loss_fns"]
    )
    tx, _ = build_optimizer(trainable, total_steps=100)
    opt_state = tx.init(trainable)
    batch = _batch(np.random.default_rng(0))
    return params, trainable, frozen, tx, opt_state, batch


def test_sharded_loss_equals_unsharded(setup):
    params, trainable, frozen, tx, opt_state, batch = setup
    mesh = create_mesh({"data": 8})

    ref = forward_train(params, CFG, batch)["losses"]["loss"]

    bs = batch_sharding(mesh)
    sharded_batch = {k: jax.device_put(v, bs) for k, v in batch.items()}
    rp = jax.device_put(params, replicated_sharding(mesh))
    out = jax.jit(lambda p, b: forward_train(p, CFG, b)["losses"]["loss"])(
        rp, sharded_batch
    )
    np.testing.assert_allclose(float(out), float(ref), rtol=2e-5)


def test_train_step_updates_trainable_only(setup):
    params, trainable, frozen, tx, opt_state, batch = setup
    mesh = create_mesh({"data": 8})
    step = make_train_step(CFG, tx, dtype=jnp.float32, donate=False)

    bs = batch_sharding(mesh)
    sharded_batch = {k: jax.device_put(v, bs) for k, v in batch.items()}

    # two steps: warmup lr is 0 at step 0 (HF cosine-with-warmup semantics)
    new_trainable, new_opt_state, losses = step(trainable, frozen, opt_state, sharded_batch)
    new_trainable, new_opt_state, losses = step(
        new_trainable, frozen, new_opt_state, sharded_batch
    )

    assert np.isfinite(float(losses["loss"]))
    assert np.isfinite(float(losses["grad_norm"]))
    # trainable params moved
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), new_trainable, trainable
    )
    assert max(jax.tree.leaves(moved)) > 0
    # log-temperature is trainable (ref losses.py:54-56)
    dt = float(
        jnp.abs(
            new_trainable["loss_fns"]["RadZeroLoss"]["log_loss_temperature"]
            - trainable["loss_fns"]["RadZeroLoss"]["log_loss_temperature"]
        )[0]
    )
    assert dt > 0


def test_train_step_multidevice_matches_single_device(setup):
    params, trainable, frozen, tx, opt_state, batch = setup
    step = make_train_step(CFG, tx, dtype=jnp.float32, donate=False)

    # single device (default placement), two steps so lr > 0
    t1, s1, _ = step(trainable, frozen, opt_state, batch)
    t1, s1, l1 = step(t1, frozen, s1, batch)

    # 8-device mesh
    mesh = create_mesh({"data": 8})
    bs = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    sb = {k: jax.device_put(v, bs) for k, v in batch.items()}
    t8, s8, _ = step(
        jax.device_put(trainable, rep),
        jax.device_put(frozen, rep),
        jax.device_put(opt_state, rep),
        sb,
    )
    t8, s8, l8 = step(t8, jax.device_put(frozen, rep), s8, sb)

    np.testing.assert_allclose(float(l8["loss"]), float(l1["loss"]), rtol=2e-5)
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), t8, t1)
    assert max(jax.tree.leaves(diffs)) < 1e-5


def test_shard_map_vlcabs_step_matches_unsharded(setup):
    """make_train_step(mesh=...) partitions the fused VL-CABS kernel with
    shard_map (tokens sharded on B, queries broadcast, dq psum'd on the
    transpose — the reference's dist.nn.all_gather semantics). Updated
    params must match the meshless step."""
    from jax.flatten_util import ravel_pytree

    params, trainable, frozen, tx, opt_state, batch = setup
    mesh = create_mesh({"data": 8})

    step_ref = make_train_step(CFG, tx, dtype=jnp.float32, donate=False)
    t_ref, o_ref, l_ref = step_ref(trainable, frozen, opt_state, batch)

    bs = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    sharded_batch = {k: jax.device_put(v, bs) for k, v in batch.items()}
    step_mesh = make_train_step(CFG, tx, dtype=jnp.float32, donate=False, mesh=mesh)
    t_out, o_out, l_out = step_mesh(
        jax.device_put(trainable, rep),
        jax.device_put(frozen, rep),
        jax.device_put(opt_state, rep),
        sharded_batch,
    )

    np.testing.assert_allclose(float(l_out["loss"]), float(l_ref["loss"]), rtol=2e-5)
    np.testing.assert_allclose(
        float(l_out["grad_norm"]), float(l_ref["grad_norm"]), rtol=2e-4
    )
    fa, _ = ravel_pytree(jax.device_get(t_out))
    fb, _ = ravel_pytree(jax.device_get(t_ref))
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), rtol=1e-4, atol=1e-6)
