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


def test_with_fused_towers_skips_configs_without_attn_impl():
    """with_fused_towers is the single guard for every inference surface
    (scorer/serving/export): towers without an ``attn_impl`` field (SAM/
    CLIP/MAE) must pass through untouched instead of crashing
    dataclasses.replace; DINOv2-style vision and the align adapter flip
    to the fused serving kernels; text is never touched."""
    from radzero_tpu.models.configuration import ViTConfig, with_fused_towers

    flagship = _cfg(
        vision=ViTConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2,
                         mlp_ratio=2.0, patch_size=14, pretrain_img_size=28, img_size=28),
        text=TextConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=64, vocab_size=101),
    )
    out = with_fused_towers(flagship)
    assert out.vision.attn_impl == "fused"
    assert out.align.attn_impl == "fused"
    assert out.text.attn_impl == flagship.text.attn_impl

    alt = dataclasses.replace(
        flagship,
        vision=MAEViTConfig(hidden_size=D, num_hidden_layers=1,
                            num_attention_heads=2, patch_size=14, img_size=28),
    )
    out = with_fused_towers(alt)
    assert out.vision is alt.vision  # no attn_impl field: untouched
    assert out.align.attn_impl == "fused"


def test_scorer_fused_tower_works_with_alt_vision_tower():
    """Regression: ZeroShotScorer's fused_tower=True (the TPU default;
    explicit here because the CPU default resolves to False) raised
    TypeError for every non-dinov2 vision tower (dataclasses.replace on
    a config with no attn_impl field)."""
    from radzero_tpu.data.processing import BlipStyleImageProcessor
    from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer
    from radzero_tpu.eval.scorer import ZeroShotScorer

    cfg = _cfg(
        vision=MAEViTConfig(hidden_size=D, num_hidden_layers=1,
                            num_attention_heads=2, patch_size=14, img_size=28),
        text=TextConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=64, vocab_size=101,
                        max_position_embeddings=40),
    )
    params = init_radzero(jax.random.PRNGKey(3), cfg)
    scorer = ZeroShotScorer(
        params, cfg,
        BlipStyleImageProcessor(size=28),
        WhitespaceHashTokenizer(vocab_size=101, max_length=8),
        batch_size=2, fused_tower=True,
    )
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 255, (28, 28, 3), dtype=np.uint8) for _ in range(2)]
    logits, _ = scorer.score(imgs, lambda x: x, ["opacity", "effusion"])
    assert logits.shape == (2, 2)
    assert np.isfinite(np.asarray(logits)).all()


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
