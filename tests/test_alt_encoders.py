"""Alternate encoder parity/behavior tests: CLIP vision vs HF, BERT vs HF,
SigLIP variant, MAE ViT contract, CLIP text, registries."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from radzero_tpu.models.bert import (
    BertConfig,
    aggregate_tokens,
    bert_forward,
    convert_bert,
    init_bert,
)
from radzero_tpu.models.clip_text import ClipTextConfig, clip_text_forward, init_clip_text
from radzero_tpu.models.clip_vit import (
    ClipViTConfig,
    clip_vit_forward,
    convert_clip_vision,
    init_clip_vit,
)
from radzero_tpu.models.encoders import build_text_encoder, build_vision_encoder
from radzero_tpu.models.mae_vit import MAEViTConfig, init_mae_vit, mae_vision_tokens


def test_clip_vision_matches_hf():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, patch_size=16, image_size=64,
        hidden_act="quick_gelu", attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = CLIPVisionModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = ClipViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, patch_size=16, pretrain_img_size=64, img_size=64,
    )
    params = convert_clip_vision(sd, 2)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    out = np.asarray(clip_vit_forward(params, cfg, x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=3e-5)


def test_clip_vision_highres_pos_interp_runs():
    cfg = ClipViTConfig(
        hidden_size=64, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=128, patch_size=16, pretrain_img_size=64, img_size=96,
    )
    params = init_clip_vit(jax.random.PRNGKey(0), cfg)
    x = np.random.default_rng(1).standard_normal((1, 96, 96, 3)).astype(np.float32)
    out = clip_vit_forward(params, cfg, x)
    assert out.shape == (1, 1 + 36, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_bert_matches_hf():
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    hf_cfg = HFBertConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, vocab_size=211, max_position_embeddings=40,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu", attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = BertModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = BertConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, vocab_size=211, max_position_embeddings=40,
    )
    params = convert_bert(sd, 2)

    rng = np.random.default_rng(2)
    ids = rng.integers(3, 211, (3, 17)).astype(np.int64)
    mask = np.ones((3, 17), np.int64)
    mask[1, 10:] = 0
    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()
    out = np.asarray(bert_forward(params, cfg, ids, mask))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=3e-5)


def test_aggregate_tokens_merges_wordpieces():
    emb = np.zeros((1, 2, 6, 4), np.float32)
    emb[0, :, 1] = 1.0   # "pneu"
    emb[0, :, 2] = 3.0   # "##monia"
    emb[0, :, 3] = 5.0   # "present"
    tokens = [["[CLS]", "pneu", "##monia", "present", "[SEP]", "[PAD]"]]
    out, words = aggregate_tokens(emb, tokens)
    assert words == [["pneumonia", "present"]]
    np.testing.assert_allclose(out[0, :, 0], np.full((2, 4), 2.0))  # mean(1,3)
    np.testing.assert_allclose(out[0, :, 1], np.full((2, 4), 5.0))


def test_siglip_variant_no_cls():
    cfg = ClipViTConfig(
        model_type="siglip", hidden_size=64, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=128, patch_size=16, pretrain_img_size=64, img_size=64,
        hidden_act="gelu_pytorch_tanh", use_class_token=False, final_layernorm=True,
    )
    params = init_clip_vit(jax.random.PRNGKey(3), cfg)
    x = np.random.default_rng(3).standard_normal((1, 64, 64, 3)).astype(np.float32)
    out = clip_vit_forward(params, cfg, x)
    assert out.shape == (1, 16, 64)  # no CLS slot


def test_mae_vision_tokens_contract():
    cfg = MAEViTConfig(hidden_size=64, num_hidden_layers=2, num_attention_heads=4, patch_size=16)
    params = init_mae_vit(jax.random.PRNGKey(4), cfg)
    x = np.random.default_rng(4).standard_normal((2, 64, 64, 3)).astype(np.float32)
    tokens = mae_vision_tokens(params, cfg, x)
    assert tokens.shape == (2, 1 + 16, 64)
    assert np.isfinite(np.asarray(tokens)).all()


def test_clip_text_pooling_and_causality():
    cfg = ClipTextConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=64, vocab_size=50, max_position_embeddings=16, eos_token_id=49,
    )
    params = init_clip_text(jax.random.PRNGKey(5), cfg)
    ids = np.array([[1, 5, 7, 49, 0, 0]], np.int32)
    mask = np.array([[1, 1, 1, 1, 0, 0]], np.int32)
    hidden, pooled = clip_text_forward(params, cfg, ids, mask)
    assert hidden.shape == (1, 6, 32) and pooled.shape == (1, 32)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(hidden[0, 3])[None], rtol=1e-6)

    # causality: changing a later token must not affect earlier positions
    ids2 = ids.copy()
    ids2[0, 2] = 8
    hidden2, _ = clip_text_forward(params, cfg, ids2, mask)
    np.testing.assert_allclose(
        np.asarray(hidden[0, :2]), np.asarray(hidden2[0, :2]), rtol=1e-5, atol=1e-6
    )


def test_registries_have_reference_factory_entries():
    for vt in ("dinov2", "clip", "siglip", "biomedclip", "xrayclip", "m3ae"):
        init, apply = build_vision_encoder(vt)
        assert callable(init) and callable(apply)
    for tt in ("mpnet", "bioclinicalmpbert", "clip_text", "siglip_text"):
        init, apply = build_text_encoder(tt)
        assert callable(init) and callable(apply)


def test_raddino_aliases_dinov2_tower():
    """RadDINO (Microsoft CXR DINOv2-B) is architecture-identical to the
    dinov2 tower: same init/forward and the same persistent-padding
    fast path."""
    import dataclasses

    import jax
    import numpy as np

    from radzero_tpu.models.configuration import (
        AlignConfig, LossConfig, RadZeroConfig, TextConfig, ViTConfig,
    )
    from radzero_tpu.models.radzero import forward_vision, init_radzero

    D = 32
    base = RadZeroConfig(
        vision=ViTConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2,
                         mlp_ratio=2.0, patch_size=14, pretrain_img_size=28, img_size=28),
        text=TextConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=64, vocab_size=101, max_position_embeddings=40),
        align=AlignConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0),
        loss=LossConfig(hidden_dim=D),
    )
    rad = dataclasses.replace(
        base, vision=dataclasses.replace(base.vision, model_type="raddino")
    )
    p1 = init_radzero(jax.random.PRNGKey(0), base)
    p2 = init_radzero(jax.random.PRNGKey(0), rad)
    x = np.random.default_rng(0).standard_normal((1, 28, 28, 3)).astype(np.float32)
    o1 = forward_vision(p1, base, x)["vision_tokens"]
    o2 = forward_vision(p2, rad, x)["vision_tokens"]
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
