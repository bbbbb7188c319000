"""ViT tower parity vs HF Dinov2Model (the reference's vision encoder).

Strategy (SURVEY.md §4): the reference ships no tests; numeric parity
against the HF torch implementation it wraps is the substitute oracle.
Random-weight small configs exercise every architectural detail
(LayerScale, pre-LN, final LN, bicubic pos-embed interpolation at
non-native resolution).
"""

import numpy as np
import pytest
import torch

from radzero_tpu.models.configuration import ViTConfig
from radzero_tpu.models.convert import convert_dinov2
from radzero_tpu.models.vit import vit_forward

SMALL = dict(
    hidden_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    mlp_ratio=2.0,
    patch_size=14,
    num_channels=3,
    layer_norm_eps=1e-6,
    layerscale_value=1.0,
)


def _hf_model(image_size):
    from transformers.models.dinov2.configuration_dinov2 import Dinov2Config
    from transformers.models.dinov2.modeling_dinov2 import Dinov2Model

    cfg = Dinov2Config(
        hidden_size=SMALL["hidden_size"],
        num_hidden_layers=SMALL["num_hidden_layers"],
        num_attention_heads=SMALL["num_attention_heads"],
        mlp_ratio=SMALL["mlp_ratio"],
        patch_size=SMALL["patch_size"],
        num_channels=3,
        image_size=image_size,
        layer_norm_eps=1e-6,
        layerscale_value=1.0,
        hidden_act="gelu",
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Dinov2Model(cfg).eval()
    return model


@pytest.mark.parametrize("run_size,pretrain_size", [(56, 56), (112, 56)])
def test_vit_matches_hf_dinov2(run_size, pretrain_size):
    """Same weights, same input -> same tokens; includes the high-res
    pos-embed interpolation path (run_size != pretrain_size)."""
    model = _hf_model(pretrain_size)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = ViTConfig(**SMALL, pretrain_img_size=pretrain_size, img_size=run_size)
    params = convert_dinov2(sd, cfg.num_hidden_layers)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, run_size, run_size, 3)).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).last_hidden_state.numpy()

    out = np.asarray(vit_forward(params, cfg, x))

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-5)


def test_vit_align_encoder_matches_hf_dinov2_encoder():
    """The align transformer is a raw Dinov2Encoder (no embed, no final LN):
    ref exp/cxr_pt/model/align_transformers.py:23-45."""
    from transformers.models.dinov2.configuration_dinov2 import Dinov2Config
    from transformers.models.dinov2.modeling_dinov2 import Dinov2Encoder

    hf_cfg = Dinov2Config(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        mlp_ratio=2.0,
        hidden_act="gelu",
        layer_norm_eps=1e-6,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    enc = Dinov2Encoder(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}

    from radzero_tpu.models.configuration import AlignConfig
    from radzero_tpu.models.convert import convert_dinov2_encoder_only
    from radzero_tpu.models.vit import vit_encoder

    acfg = AlignConfig(hidden_size=64, num_hidden_layers=2, num_attention_heads=4, mlp_ratio=2.0)
    layers = convert_dinov2_encoder_only(sd, 2)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 17, 64)).astype(np.float32)

    with torch.no_grad():
        ref = enc(torch.from_numpy(x)).last_hidden_state.numpy()

    out = np.asarray(vit_encoder(layers, acfg.as_vit(), x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-5)
