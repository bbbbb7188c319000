"""Composite model with alternate towers: bert text + mae vision end-to-end."""

import dataclasses

import jax
import numpy as np

from radzero_tpu.models.configuration import (
    AlignConfig,
    LossConfig,
    RadZeroConfig,
    TextConfig,
)
from radzero_tpu.models.mae_vit import MAEViTConfig
from radzero_tpu.models.radzero import compute_logits, forward_train, init_radzero

D = 32


def _cfg(vision, text):
    return RadZeroConfig(
        vision=vision,
        text=text,
        align=AlignConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0),
        loss=LossConfig(hidden_dim=D),
    )


def test_bert_text_tower_in_composite():
    cfg = _cfg(
        vision=__import__("radzero_tpu.models.configuration", fromlist=["ViTConfig"]).ViTConfig(
            hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0,
            patch_size=14, pretrain_img_size=28, img_size=28,
        ),
        text=TextConfig(
            model_type="bioclinicalmpbert", hidden_size=D, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=64, vocab_size=101,
            max_position_embeddings=40,
        ),
    )
    params = init_radzero(jax.random.PRNGKey(0), cfg)
    assert "token_type" in params["text_model"]["embeddings"]  # bert tower built

    rng = np.random.default_rng(0)
    out = compute_logits(
        params, cfg,
        rng.standard_normal((2, 28, 28, 3)).astype(np.float32),
        rng.integers(3, 101, (3, 8)).astype(np.int32),
        np.ones((3, 8), np.int32),
    )
    assert out["logits"].shape == (2, 3)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_biomedclip_text_tower_in_composite():
    """model_type='biomedclip' text (open_clip PubMedBERT = BERT arch).
    The reference builds this tower (text_encoders.py:16-19) but its
    composite forward then raises NotImplementedError on it
    (modeling.py:128-206 handles only MPNetModel/BertModel instances);
    here it runs end to end through the BERT path."""
    cfg = _cfg(
        vision=__import__("radzero_tpu.models.configuration", fromlist=["ViTConfig"]).ViTConfig(
            hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0,
            patch_size=14, pretrain_img_size=28, img_size=28,
        ),
        text=TextConfig(
            model_type="biomedclip", hidden_size=D, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=64, vocab_size=101,
            max_position_embeddings=40,
        ),
    )
    params = init_radzero(jax.random.PRNGKey(2), cfg)
    assert "token_type" in params["text_model"]["embeddings"]

    rng = np.random.default_rng(2)
    out = compute_logits(
        params, cfg,
        rng.standard_normal((2, 28, 28, 3)).astype(np.float32),
        rng.integers(3, 101, (3, 8)).astype(np.int32),
        np.ones((3, 8), np.int32),
    )
    assert out["logits"].shape == (2, 3)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_mae_vision_tower_in_composite():
    cfg = _cfg(
        vision=MAEViTConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2, patch_size=14, img_size=28),
        text=TextConfig(
            hidden_size=D, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=64, vocab_size=101, max_position_embeddings=40,
        ),
    )
    params = init_radzero(jax.random.PRNGKey(1), cfg)
    assert "cls_token" in params["vision_model"]

    rng = np.random.default_rng(1)
    batch = {
        "pixel_values": rng.standard_normal((2, 28, 28, 3)).astype(np.float32),
        "input_ids": rng.integers(3, 101, (4, 8)).astype(np.int32),
        "attention_mask": np.ones((4, 8), np.int32),
        "group_map": np.array([0, 0, 1, 1], np.int32),
        "row_mask": np.ones(4, np.float32),
    }
    out = forward_train(params, cfg, batch)
    assert np.isfinite(float(out["losses"]["loss"]))
