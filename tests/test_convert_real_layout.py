"""Converter validation against REAL pretrained checkpoint layouts.

The toy-dim tests (test_convert_tool.py, test_vit_parity.py) exercise
every architectural branch; these tests pin the converter against the
TRUE configs the reference loads (model/__init__.py:14-55):

- ``facebook/dinov2-base``-class layout: Dinov2Config defaults (768d,
  12 layers, 12 heads, patch 14) adapted to image_size=518 as the
  XrayDINOv2 tower is (radzero.yaml:17-19) — including the 37x37
  pos-embed table and its bicubic interpolation when run at another
  resolution.
- ``sentence-transformers/all-mpnet-base-v2``-class layout: MPNetConfig
  defaults (30527 vocab, 514 positions, 12 layers, 768d) — including
  relative-position buckets.

No egress is available, so the models are instantiated from the local
``transformers`` at their true configs (random init — layout and
numerics, not weight values, are what the converter must get right),
round-tripped through ``save_pretrained`` (the exact on-disk layout of
a hub snapshot), converted, and compared forward vs the torch oracle.
"""

import numpy as np
import pytest
import torch


def _dinov2_base_518():
    from transformers.models.dinov2.configuration_dinov2 import Dinov2Config
    from transformers.models.dinov2.modeling_dinov2 import Dinov2Model

    cfg = Dinov2Config(image_size=518, attn_implementation="eager")
    torch.manual_seed(0)
    return Dinov2Model(cfg).eval(), cfg


@pytest.mark.slow
def test_dinov2_true_config_save_pretrained_roundtrip(tmp_path):
    """dinov2-base @518 -> save_pretrained -> load_state_dict ->
    convert_dinov2 -> forward parity at a non-native resolution
    (exercises the real 1370-row pos-embed table + interpolation)."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from tools.convert_checkpoint import load_state_dict

    from radzero_tpu.models.configuration import ViTConfig
    from radzero_tpu.models.convert import convert_dinov2
    from radzero_tpu.models.vit import vit_forward

    model, hf_cfg = _dinov2_base_518()
    model.save_pretrained(tmp_path / "dinov2")
    sd = load_state_dict(str(tmp_path / "dinov2"))

    cfg = ViTConfig(
        hidden_size=hf_cfg.hidden_size,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        mlp_ratio=hf_cfg.mlp_ratio,
        patch_size=hf_cfg.patch_size,
        layer_norm_eps=hf_cfg.layer_norm_eps,
        layerscale_value=hf_cfg.layerscale_value,
        pretrain_img_size=518,
        img_size=126,  # 9x9 grid: true-config interpolation path, cheap on CPU
    )
    params = convert_dinov2(sd, cfg.num_hidden_layers)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 126, 126, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    del model

    out = np.asarray(vit_forward(params, cfg, x))
    assert out.shape == ref.shape == (1, 82, 768)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=5e-5)


@pytest.mark.slow
def test_mpnet_true_config_save_pretrained_roundtrip(tmp_path):
    """all-mpnet-base-v2-layout (MPNetConfig defaults) -> save_pretrained
    -> convert_mpnet -> forward parity incl. relative-position buckets
    and ragged attention masks."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from tools.convert_checkpoint import load_state_dict

    from transformers.models.mpnet.configuration_mpnet import MPNetConfig
    from transformers.models.mpnet.modeling_mpnet import MPNetModel

    from radzero_tpu.models.configuration import TextConfig
    from radzero_tpu.models.convert import convert_mpnet
    from radzero_tpu.models.mpnet import mpnet_forward

    hf_cfg = MPNetConfig(attn_implementation="eager")
    torch.manual_seed(1)
    model = MPNetModel(hf_cfg, add_pooling_layer=False).eval()
    model.save_pretrained(tmp_path / "mpnet")
    sd = load_state_dict(str(tmp_path / "mpnet"))

    cfg = TextConfig(
        hidden_size=hf_cfg.hidden_size,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        vocab_size=hf_cfg.vocab_size,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        layer_norm_eps=hf_cfg.layer_norm_eps,
        relative_attention_num_buckets=hf_cfg.relative_attention_num_buckets,
    )
    params = convert_mpnet(sd, cfg.num_hidden_layers)

    rng = np.random.default_rng(1)
    ids = rng.integers(3, hf_cfg.vocab_size, (3, 17)).astype(np.int32)
    mask = np.ones((3, 17), np.int32)
    mask[1, 9:] = 0
    mask[2, 4:] = 0

    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    del model

    out = np.asarray(mpnet_forward(params, cfg, ids, mask))
    assert out.shape == ref.shape == (3, 17, 768)
    # padded positions are unspecified in our output; compare real tokens
    for i, n in enumerate((17, 9, 4)):
        np.testing.assert_allclose(out[i, :n], ref[i, :n], rtol=1e-4, atol=5e-5)
