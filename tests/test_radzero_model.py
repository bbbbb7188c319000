"""End-to-end RadZeroModel parity vs a torch oracle.

The oracle composes HF torch modules exactly the way the reference wires
them (documented flow: modeling.py:96-123 vision, :128-156 text,
losses.py:71-124 + 187-240 VL-CABS, modeling.py:278-328 compute_logits)
but is an independent implementation.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from radzero_tpu.models.configuration import (
    AlignConfig,
    LossConfig,
    RadZeroConfig,
    TextConfig,
    ViTConfig,
)
from radzero_tpu.models.convert import (
    convert_dinov2,
    convert_dinov2_encoder_only,
    convert_mpnet,
)
from radzero_tpu.models.radzero import (
    compute_logits,
    forward_train,
    forward_vision,
    init_radzero,
)

D = 64
CFG = RadZeroConfig(
    vision=ViTConfig(
        hidden_size=D, num_hidden_layers=2, num_attention_heads=4, mlp_ratio=2.0,
        patch_size=14, pretrain_img_size=56, img_size=56,
    ),
    text=TextConfig(
        hidden_size=D, num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
        vocab_size=211, max_position_embeddings=66,
    ),
    align=AlignConfig(hidden_size=D, num_hidden_layers=2, num_attention_heads=4, mlp_ratio=2.0),
    loss=LossConfig(hidden_dim=D, sim_op="cos", loss_temperature=0.07),
)


def _torch_towers(seed=0):
    from transformers.models.dinov2.configuration_dinov2 import Dinov2Config
    from transformers.models.dinov2.modeling_dinov2 import Dinov2Encoder, Dinov2Model
    from transformers.models.mpnet.configuration_mpnet import MPNetConfig
    from transformers.models.mpnet.modeling_mpnet import MPNetModel

    torch.manual_seed(seed)
    vis = Dinov2Model(
        Dinov2Config(
            hidden_size=D, num_hidden_layers=2, num_attention_heads=4, mlp_ratio=2.0,
            patch_size=14, image_size=56, hidden_act="gelu",
            attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
            attn_implementation="eager",
        )
    ).eval()
    align = Dinov2Encoder(
        Dinov2Config(
            hidden_size=D, num_hidden_layers=2, num_attention_heads=4, mlp_ratio=2.0,
            hidden_act="gelu", attn_implementation="eager",
        )
    ).eval()
    txt = MPNetModel(
        MPNetConfig(
            hidden_size=D, num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
            vocab_size=211, max_position_embeddings=66,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0, hidden_act="gelu",
        ),
        add_pooling_layer=False,
    ).eval()
    ln = torch.nn.LayerNorm(D)  # the loss's shared modality LN (losses.py:51)
    torch.nn.init.normal_(ln.weight, 1.0, 0.05)
    torch.nn.init.normal_(ln.bias, 0.0, 0.05)
    return vis, align, txt, ln


def _jax_params_from_torch(vis, align, txt, ln):
    params = init_radzero(jax.random.PRNGKey(0), CFG)
    params["vision_model"] = convert_dinov2(
        {k: v.detach().numpy() for k, v in vis.state_dict().items()}, 2
    )
    params["align_transformer"]["layers"] = convert_dinov2_encoder_only(
        {k: v.detach().numpy() for k, v in align.state_dict().items()}, 2
    )
    params["text_model"] = convert_mpnet(
        {k: v.detach().numpy() for k, v in txt.state_dict().items()}, 2
    )
    params["loss_fns"]["RadZeroLoss"]["layer_norm"] = {
        "scale": ln.weight.detach().numpy(),
        "bias": ln.bias.detach().numpy(),
    }
    return params


def _oracle_compute_logits(vis, align, txt, ln, x_nchw, ids, mask, tau=0.07):
    """Torch oracle for compute_logits (modeling.py:278-328 'radzero')."""
    with torch.no_grad():
        tokens = vis(x_nchw).last_hidden_state
        tokens = align(tokens).last_hidden_state

        hidden = txt(input_ids=ids, attention_mask=mask).last_hidden_state
        m = mask.unsqueeze(-1).float()
        text_raw = (hidden * m).sum(1) / m.sum(1).clamp(min=1e-9)

        tokens_ln = ln(tokens)
        text_ln = ln(text_raw)

        qn = F.normalize(text_ln, dim=-1)
        tn = F.normalize(tokens_ln, dim=-1)
        scores = torch.einsum("nd,bld->bnl", qn, tn) / tau
        attn = scores.softmax(-1)
        # cos mode aggregates the NORMALISED tokens (losses.py:212-224)
        agg = torch.einsum("bnl,bld->bnd", attn, tn)
        logits_nb = torch.einsum(
            "bnd,bnd->bn", F.normalize(text_ln, dim=-1).unsqueeze(0).expand_as(agg), F.normalize(agg, dim=-1)
        )
        logits = logits_nb / tau  # (B, N): t2i.T already (bn layout), / exp(log tau)
        sim = scores[:, :, 1:]  # strip CLS column
    return logits.numpy(), sim.numpy()


def test_compute_logits_matches_torch_oracle():
    vis, align, txt, ln = _torch_towers()
    params = _jax_params_from_torch(vis, align, txt, ln)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    N, L = 3, 12
    ids = np.full((N, L), 1, np.int64)
    mask = np.zeros((N, L), np.int64)
    for i in range(N):
        ln_i = int(rng.integers(4, L + 1))
        ids[i, :ln_i] = rng.integers(3, 211, ln_i)
        ids[i, 0], ids[i, ln_i - 1] = 0, 2
        mask[i, :ln_i] = 1

    ref_logits, ref_sim = _oracle_compute_logits(
        vis, align, txt, ln,
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(ids), torch.from_numpy(mask),
    )

    out = compute_logits(params, CFG, x, ids, mask)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref_logits, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["similarity_scores"]), ref_sim, rtol=1e-3, atol=2e-4
    )
    # similarity-map fidelity target: MAE < 1e-3 (BASELINE.md north star)
    mae = np.abs(np.asarray(out["similarity_scores"]) - ref_sim).mean()
    assert mae < 1e-3, mae


def test_forward_train_losses_finite_and_masked():
    params = init_radzero(jax.random.PRNGKey(1), CFG)
    rng = np.random.default_rng(1)
    B, S, L = 2, 6, 10
    batch = {
        "pixel_values": rng.standard_normal((B, 56, 56, 3)).astype(np.float32),
        "input_ids": rng.integers(3, 211, (S, L)).astype(np.int32),
        "attention_mask": np.ones((S, L), np.int32),
        "group_map": np.array([0, 0, 1, 1, 0, 0], np.int32),
        "row_mask": np.array([1, 1, 1, 1, 0, 0], np.float32),
    }
    out = forward_train(params, CFG, batch)
    assert np.isfinite(float(out["losses"]["loss"]))
    assert "t2i_loss" in out["losses"]

    # padding invariance: growing S with masked rows must not change the loss
    batch2 = dict(batch)
    batch2["input_ids"] = np.concatenate([batch["input_ids"], batch["input_ids"][:2]], 0)
    batch2["attention_mask"] = np.concatenate([batch["attention_mask"], batch["attention_mask"][:2]], 0)
    batch2["group_map"] = np.concatenate([batch["group_map"], [0, 1]]).astype(np.int32)
    batch2["row_mask"] = np.concatenate([batch["row_mask"], [0.0, 0.0]]).astype(np.float32)
    out2 = forward_train(params, CFG, batch2)
    np.testing.assert_allclose(
        float(out["losses"]["loss"]), float(out2["losses"]["loss"]), rtol=1e-6
    )


def test_image_features_shape_and_norm():
    params = init_radzero(jax.random.PRNGKey(2), CFG)
    x = np.random.default_rng(2).standard_normal((2, 56, 56, 3)).astype(np.float32)
    v = forward_vision(params, CFG, x)
    assert v["image_features"].shape == (2, 2 * D)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(v["image_features"]), axis=-1), np.ones(2), rtol=1e-5
    )


def test_bf16_serving_path_close_to_fp32():
    """Quantify the bf16 production path against the fp32 parity path."""
    import jax
    import jax.numpy as jnp

    params = init_radzero(jax.random.PRNGKey(9), CFG)
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    ids = rng.integers(3, 211, (3, 10)).astype(np.int32)
    mask = np.ones((3, 10), np.int32)

    out32 = compute_logits(params, CFG, x, ids, mask, dtype=jnp.float32)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    out16 = compute_logits(p16, CFG, jnp.asarray(x, jnp.bfloat16), ids, mask, dtype=jnp.bfloat16)

    dl = np.abs(np.asarray(out16["logits"], np.float32) - np.asarray(out32["logits"]))
    dm = np.abs(
        np.asarray(out16["similarity_scores"], np.float32)
        - np.asarray(out32["similarity_scores"])
    )
    # cosine logits live in [-1/tau, 1/tau]; bf16 keeps them within ~1e-1
    assert dl.max() < 0.2, dl.max()
    assert dm.mean() < 0.2, dm.mean()
