"""SAM ViT-det vision tower: HF oracle parity + composite integration.

The reference accepts model_type="sam" in its config/processing plumbing
but its encoder factory raises NotImplementedError for it
(exp/cxr_pt/model/vision_encoders.py:23-43); here the tower actually
works, checked against HF ``SamVisionEncoder``.
"""

import jax
import numpy as np
import torch

from radzero_tpu.models.convert import convert_sam
from radzero_tpu.models.sam_vit import (
    SamViTConfig,
    init_sam_vit,
    sam_neck,
    sam_trunk,
    sam_vit_forward,
)


def _tiny_pair(seed=0):
    """Matching (HF SamVisionEncoder, our params, our cfg). window_size=3
    on a 4x4 grid so the edge-padding path is exercised."""
    from transformers import SamVisionConfig
    from transformers.models.sam.modeling_sam import SamVisionEncoder

    hf_cfg = SamVisionConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        mlp_dim=64, patch_size=8, image_size=32, window_size=3,
        global_attn_indexes=[1], output_channels=16, num_channels=3,
        attention_dropout=0.0, qkv_bias=True, use_rel_pos=True, use_abs_pos=True,
        attn_implementation="eager",
    )
    model = SamVisionEncoder(hf_cfg).eval()
    # HF inits pos_embed/rel_pos tables to zeros — randomise everything so
    # the relative/absolute position paths actually contribute
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = SamViTConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        mlp_dim=64, patch_size=8, image_size=32, img_size=32, window_size=3,
        global_attn_indexes=(1,), output_channels=16,
    )
    return model, convert_sam(sd, cfg.num_hidden_layers), cfg


def test_sam_trunk_and_neck_match_hf():
    model, params, cfg = _tiny_pair()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    with torch.no_grad():
        hidden = model.patch_embed(xt)
        if model.pos_embed is not None:
            hidden = hidden + model.pos_embed
        for layer in model.layers:
            hidden = layer(hidden)
        ref_trunk = hidden.numpy()                       # (B, h, w, D)
        ref_neck = model(xt).last_hidden_state.numpy()   # (B, C, h, w)

    with jax.default_matmul_precision("highest"):
        trunk = np.asarray(sam_trunk(params, cfg, x))
        neck = np.asarray(sam_neck(params, cfg, trunk))
    np.testing.assert_allclose(trunk, ref_trunk, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        neck.transpose(0, 3, 1, 2), ref_neck, rtol=1e-4, atol=1e-5
    )


def test_sam_rel_pos_interpolation_offgrid():
    """Runtime grid != pretrain grid: abs-pos embeds resample bicubically
    and rel-pos tables resample linearly (HF get_rel_pos's interpolate)."""
    _, params, cfg = _tiny_pair(seed=1)
    import dataclasses

    cfg48 = dataclasses.replace(cfg, img_size=48)  # 6x6 grid vs stored 4x4
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 48, 48, 3)).astype(np.float32)
    out = np.asarray(sam_vit_forward(params, cfg48, x))
    assert out.shape == (1, 1 + 36, 32)
    assert np.isfinite(out).all()


def test_sam_tower_in_composite():
    from radzero_tpu.models.configuration import (
        AlignConfig,
        LossConfig,
        RadZeroConfig,
        TextConfig,
    )
    from radzero_tpu.models.radzero import compute_logits, forward_train, init_radzero

    d = 32
    cfg = RadZeroConfig(
        vision=SamViTConfig(
            hidden_size=d, num_hidden_layers=2, num_attention_heads=2,
            mlp_dim=64, patch_size=8, image_size=32, img_size=32,
            window_size=2, global_attn_indexes=(1,), output_channels=16,
        ),
        text=TextConfig(
            hidden_size=d, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=64, vocab_size=101, max_position_embeddings=40,
        ),
        align=AlignConfig(hidden_size=d, num_hidden_layers=1,
                          num_attention_heads=2, mlp_ratio=2.0),
        loss=LossConfig(hidden_dim=d),
    )
    params = init_radzero(jax.random.PRNGKey(0), cfg)
    assert isinstance(params["vision_model"]["layers"], list)  # sam tower built

    rng = np.random.default_rng(0)
    out = compute_logits(
        params, cfg,
        rng.standard_normal((2, 32, 32, 3)).astype(np.float32),
        rng.integers(3, 101, (3, 8)).astype(np.int32),
        np.ones((3, 8), np.int32),
    )
    assert out["logits"].shape == (2, 3)
    assert np.isfinite(np.asarray(out["logits"])).all()

    batch = {
        "pixel_values": rng.standard_normal((2, 32, 32, 3)).astype(np.float32),
        "input_ids": rng.integers(3, 101, (4, 8)).astype(np.int32),
        "attention_mask": np.ones((4, 8), np.int32),
        "group_map": np.array([0, 0, 1, 1], np.int32),
        "row_mask": np.ones(4, np.float32),
    }
    tr = forward_train(params, cfg, batch)
    assert np.isfinite(float(tr["losses"]["loss"]))


def test_vision_config_yaml_dispatch():
    """radzero_config_from_dict routes vision_config.model_type to the
    tower-specific config class (sam included — the reference accepts it
    in config then crashes in its encoder factory)."""
    from radzero_tpu.models.configuration import radzero_config_from_dict
    from radzero_tpu.models.clip_vit import ClipViTConfig

    cfg = radzero_config_from_dict({
        "vision_config": {
            "model_type": "sam", "hidden_size": 32, "num_hidden_layers": 2,
            "num_attention_heads": 2, "mlp_dim": 64, "patch_size": 8,
            "image_size": 32, "img_size": 32, "window_size": 2,
            "global_attn_indexes": [1], "output_channels": 16,
        },
        "text_config": {"hidden_size": 32},
    })
    assert isinstance(cfg.vision, SamViTConfig)
    assert cfg.vision.global_attn_indexes == (1,)
    hash(cfg.vision)  # stays usable as a static jit arg

    cfg2 = radzero_config_from_dict(
        {"vision_config": {"model_type": "siglip", "hidden_size": 64}}
    )
    assert isinstance(cfg2.vision, ClipViTConfig)


def test_sam_registry_entry():
    from radzero_tpu.models.encoders import build_vision_encoder

    init_fn, apply_fn = build_vision_encoder("sam")
    cfg = SamViTConfig(
        hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        mlp_dim=32, patch_size=8, image_size=16, img_size=16,
        window_size=2, global_attn_indexes=(), output_channels=8,
    )
    params = init_fn(jax.random.PRNGKey(0), cfg)
    x = np.random.default_rng(0).standard_normal((1, 16, 16, 3)).astype(np.float32)
    out = apply_fn(params, cfg, x)
    assert out.shape == (1, 1 + 4, 16)
