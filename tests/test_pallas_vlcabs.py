"""Fused Pallas VL-CABS kernel parity vs the jnp reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from radzero_tpu.ops.vlcabs import vlcabs_similarity


def test_fused_matches_xla_path():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((5, 64)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((3, 37, 64)), jnp.float32)
    tau = jnp.asarray(0.07, jnp.float32)

    ref_logits, ref_scores = vlcabs_similarity(
        q, t, sim_op="cos", temperature=tau, need_scores=True, impl="xla"
    )
    out_logits, out_scores = vlcabs_similarity(
        q, t, sim_op="cos", temperature=tau, need_scores=True, impl="fused"
    )
    np.testing.assert_allclose(np.asarray(out_logits), np.asarray(ref_logits), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_scores), np.asarray(ref_scores), rtol=1e-4, atol=1e-4)


def test_fused_padded_shapes():
    """Non-aligned N and L are padded internally and sliced back."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((3, 32)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((2, 130, 32)), jnp.float32)
    tau = jnp.asarray(0.07, jnp.float32)
    logits, scores = vlcabs_similarity(
        q, t, sim_op="cos", temperature=tau, need_scores=True, impl="fused"
    )
    assert logits.shape == (3, 2)
    assert scores.shape == (2, 3, 130)
    ref_logits, ref_scores = vlcabs_similarity(
        q, t, sim_op="cos", temperature=tau, need_scores=True, impl="xla"
    )
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores), rtol=1e-4, atol=1e-4)


def test_compute_logits_uses_fused_and_matches(monkeypatch):
    """End-to-end compute_logits parity between fused and xla paths."""
    from radzero_tpu.models.configuration import (
        AlignConfig, LossConfig, RadZeroConfig, TextConfig, ViTConfig,
    )
    from radzero_tpu.models.radzero import compute_logits, init_radzero
    import importlib

    rl = importlib.import_module("radzero_tpu.losses.radzero_loss")

    D = 32
    cfg = RadZeroConfig(
        vision=ViTConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2,
                         mlp_ratio=2.0, patch_size=14, pretrain_img_size=28, img_size=28),
        text=TextConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=64, vocab_size=101, max_position_embeddings=40),
        align=AlignConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0),
        loss=LossConfig(hidden_dim=D),
    )
    params = init_radzero(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    pv = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    ids = rng.integers(3, 101, (3, 8)).astype(np.int32)
    mask = np.ones((3, 8), np.int32)

    out_fused = compute_logits(params, cfg, pv, ids, mask)

    orig = rl.vlcabs_similarity
    monkeypatch.setattr(
        rl, "vlcabs_similarity",
        lambda *a, **k: orig(*a, **{**k, "impl": "xla"}),
    )
    out_xla = compute_logits(params, cfg, pv, ids, mask)

    np.testing.assert_allclose(
        np.asarray(out_fused["logits"]), np.asarray(out_xla["logits"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_fused["similarity_scores"]),
        np.asarray(out_xla["similarity_scores"]),
        rtol=1e-4, atol=1e-4,
    )


def test_fused_train_forward_and_grads_match_xla():
    """The differentiable training kernel (custom VJP with flash-style
    score recompute) must match jnp autodiff for d(queries), d(tokens),
    d(tau) — including padded/masked shapes (L not lane-aligned, N not
    sublane-aligned)."""
    rng = np.random.default_rng(2)
    for n, b, l, d in ((5, 3, 37, 64), (3, 2, 130, 32), (8, 1, 128, 32)):
        q = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
        t = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
        tau = jnp.asarray(0.07, jnp.float32)
        w = jnp.asarray(rng.standard_normal((n, b)), jnp.float32)

        def loss(q, t, tau, impl):
            logits, _ = vlcabs_similarity(
                q, t, sim_op="cos", temperature=tau, impl=impl
            )
            return jnp.sum(w * logits)

        ref_val, ref_grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            q, t, tau, "xla"
        )
        out_val, out_grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            q, t, tau, "fused_train"
        )
        np.testing.assert_allclose(out_val, ref_val, rtol=1e-5, atol=1e-6)
        for og, rg, name in zip(out_grads, ref_grads, ("dq", "dt", "dtau")):
            np.testing.assert_allclose(
                np.asarray(og), np.asarray(rg), rtol=1e-4, atol=1e-5,
                err_msg=f"{name} mismatch at n={n} b={b} l={l}",
            )


def test_forward_train_uses_fused_kernel_and_matches_xla():
    """forward_train grads with the fused kernel equal the xla path at the
    model level (both towers, shared LN, MP-NCE on top)."""
    import dataclasses

    from radzero_tpu.models.configuration import (
        AlignConfig, LossConfig, RadZeroConfig, TextConfig, ViTConfig,
    )
    from radzero_tpu.models.radzero import forward_train, init_radzero

    D = 32
    base = RadZeroConfig(
        vision=ViTConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2,
                         mlp_ratio=2.0, patch_size=14, pretrain_img_size=28, img_size=28,
                         attn_impl="xla"),
        text=TextConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=64, vocab_size=101, max_position_embeddings=40),
        align=AlignConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0),
        loss=LossConfig(hidden_dim=D),
    )
    params = init_radzero(jax.random.PRNGKey(0), base)
    rng = np.random.default_rng(3)
    b, s_per, ltxt = 2, 2, 8
    s = b * s_per
    batch = {
        "pixel_values": jnp.asarray(rng.standard_normal((b, 28, 28, 3)), jnp.float32),
        "input_ids": jnp.asarray(rng.integers(3, 101, (s, ltxt)), jnp.int32),
        "attention_mask": jnp.ones((s, ltxt), jnp.int32),
        "group_map": jnp.asarray(np.repeat(np.arange(b), s_per), jnp.int32),
        "row_mask": jnp.ones((s,), jnp.float32),
    }

    def loss_with(cfg):
        def f(p):
            return forward_train(p, cfg, batch)["losses"]["loss"]
        return jax.value_and_grad(f)(params)

    fused_cfg = base  # train_impl defaults to "fused"
    xla_cfg = dataclasses.replace(base, loss=dataclasses.replace(base.loss, train_impl="xla"))
    from jax.flatten_util import ravel_pytree

    v_fused, g_fused = loss_with(fused_cfg)
    v_xla, g_xla = loss_with(xla_cfg)
    np.testing.assert_allclose(v_fused, v_xla, rtol=1e-5, atol=1e-6)
    flat_f, _ = ravel_pytree(g_fused)
    flat_x, _ = ravel_pytree(g_xla)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_x), rtol=1e-4, atol=1e-5)


def test_fused_stable_at_tiny_temperature():
    """Learned tau is unclamped; contrastive training can drive it toward
    ~0.01 (CLIP clamps for this reason). Before the row-max shift,
    exp(s) with |s| <= 1/tau overflowed fp32 at tau < ~0.0114, NaN-ing
    logits and gradients mid-training. Both fused kernels must now match
    the (softmax-stable) xla path at any tau."""
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((5, 64)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((3, 37, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((5, 3)), jnp.float32)

    for tau_v in (0.008, 0.002):
        tau = jnp.asarray(tau_v, jnp.float32)
        # forward/serving kernel
        ref_logits, ref_scores = vlcabs_similarity(
            q, t, sim_op="cos", temperature=tau, need_scores=True, impl="xla"
        )
        out_logits, out_scores = vlcabs_similarity(
            q, t, sim_op="cos", temperature=tau, need_scores=True, impl="fused"
        )
        assert np.isfinite(np.asarray(out_logits)).all()
        np.testing.assert_allclose(
            np.asarray(out_logits), np.asarray(ref_logits), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_scores), np.asarray(ref_scores), rtol=1e-4, atol=1e-4
        )

        # training kernel: forward + all three grads finite and matching
        def loss(q, t, tau, impl):
            logits, _ = vlcabs_similarity(
                q, t, sim_op="cos", temperature=tau, impl=impl
            )
            return jnp.sum(w * logits)

        ref_val, ref_grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            q, t, tau, "xla"
        )
        out_val, out_grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            q, t, tau, "fused_train"
        )
        np.testing.assert_allclose(out_val, ref_val, rtol=1e-5, atol=1e-6)
        for og, rg, name in zip(out_grads, ref_grads, ("dq", "dt", "dtau")):
            assert np.isfinite(np.asarray(og)).all(), f"{name} not finite"
            np.testing.assert_allclose(
                np.asarray(og), np.asarray(rg), rtol=1e-4, atol=1e-5,
                err_msg=f"{name} mismatch at tau={tau_v}",
            )
