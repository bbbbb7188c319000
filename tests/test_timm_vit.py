"""timm-style ViT (BioMedCLIP tower layout) converter parity.

The oracle is a compact torch implementation of the standard timm
VisionTransformer block (pre-LN, fused qkv, patch bias, trailing norm)
built from the same random state dict.
"""

import numpy as np
import torch
import torch.nn.functional as F

from radzero_tpu.models.clip_vit import ClipViTConfig, clip_vit_forward, convert_timm_vit

D, HEADS, LAYERS, P, IMG = 32, 4, 2, 16, 64


def _random_timm_state(rng):
    t = lambda *s: torch.from_numpy(rng.standard_normal(s).astype(np.float32) * 0.05)
    sd = {
        "cls_token": t(1, 1, D),
        "pos_embed": t(1, 1 + (IMG // P) ** 2, D),
        "patch_embed.proj.weight": t(D, 3, P, P),
        "patch_embed.proj.bias": t(D),
        "norm.weight": 1 + t(D),
        "norm.bias": t(D),
    }
    for i in range(LAYERS):
        q = f"blocks.{i}"
        sd.update(
            {
                f"{q}.norm1.weight": 1 + t(D), f"{q}.norm1.bias": t(D),
                f"{q}.attn.qkv.weight": t(3 * D, D), f"{q}.attn.qkv.bias": t(3 * D),
                f"{q}.attn.proj.weight": t(D, D), f"{q}.attn.proj.bias": t(D),
                f"{q}.norm2.weight": 1 + t(D), f"{q}.norm2.bias": t(D),
                f"{q}.mlp.fc1.weight": t(2 * D, D), f"{q}.mlp.fc1.bias": t(2 * D),
                f"{q}.mlp.fc2.weight": t(D, 2 * D), f"{q}.mlp.fc2.bias": t(D),
            }
        )
    return sd


def _torch_timm_forward(sd, x_nchw):
    """Standard timm VisionTransformer forward (oracle)."""
    with torch.no_grad():
        x = F.conv2d(x_nchw, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"],
                     stride=P)
        b, d, gh, gw = x.shape
        x = x.flatten(2).transpose(1, 2)  # (B, N, D)
        cls = sd["cls_token"].expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1) + sd["pos_embed"]

        hd = D // HEADS
        for i in range(LAYERS):
            q = f"blocks.{i}"
            h = F.layer_norm(x, (D,), sd[f"{q}.norm1.weight"], sd[f"{q}.norm1.bias"], eps=1e-5)
            qkv = F.linear(h, sd[f"{q}.attn.qkv.weight"], sd[f"{q}.attn.qkv.bias"])
            qq, kk, vv = qkv.chunk(3, dim=-1)

            def heads(t):
                return t.view(b, -1, HEADS, hd).transpose(1, 2)

            a = F.scaled_dot_product_attention(heads(qq), heads(kk), heads(vv))
            a = a.transpose(1, 2).reshape(b, -1, D)
            x = x + F.linear(a, sd[f"{q}.attn.proj.weight"], sd[f"{q}.attn.proj.bias"])

            h = F.layer_norm(x, (D,), sd[f"{q}.norm2.weight"], sd[f"{q}.norm2.bias"], eps=1e-5)
            h = F.gelu(F.linear(h, sd[f"{q}.mlp.fc1.weight"], sd[f"{q}.mlp.fc1.bias"]))
            x = x + F.linear(h, sd[f"{q}.mlp.fc2.weight"], sd[f"{q}.mlp.fc2.bias"])

        x = F.layer_norm(x, (D,), sd["norm.weight"], sd["norm.bias"], eps=1e-5)
    return x.numpy()


def test_timm_vit_converter_parity():
    rng = np.random.default_rng(0)
    sd_t = _random_timm_state(rng)
    sd = {k: v.numpy() for k, v in sd_t.items()}

    cfg = ClipViTConfig(
        hidden_size=D, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=2 * D, patch_size=P, pretrain_img_size=IMG, img_size=IMG,
        hidden_act="gelu_exact", final_layernorm=True,
    )
    params = convert_timm_vit(sd, LAYERS)
    assert "pre_ln" not in params  # timm has no pre-layernorm

    x = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    ref = _torch_timm_forward(sd_t, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = np.asarray(clip_vit_forward(params, cfg, x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-5)
