"""Converter tests: full reference-layout checkpoint -> our param tree,
and the CLI tool round-trip through safetensors + Orbax."""

import os
import subprocess
import sys

import numpy as np
import torch

from radzero_tpu.models.convert import convert_radzero_checkpoint


def _fake_reference_state_dict(d=32, vision_layers=2, align_layers=1, text_layers=2):
    """Assemble a CxrAlignModel-shaped torch state dict from HF modules."""
    from transformers.models.dinov2.configuration_dinov2 import Dinov2Config
    from transformers.models.dinov2.modeling_dinov2 import Dinov2Encoder, Dinov2Model
    from transformers.models.mpnet.configuration_mpnet import MPNetConfig
    from transformers.models.mpnet.modeling_mpnet import MPNetModel

    torch.manual_seed(0)
    vis = Dinov2Model(
        Dinov2Config(hidden_size=d, num_hidden_layers=vision_layers,
                     num_attention_heads=2, mlp_ratio=2.0, patch_size=14, image_size=28)
    )
    align = Dinov2Encoder(
        Dinov2Config(hidden_size=d, num_hidden_layers=align_layers,
                     num_attention_heads=2, mlp_ratio=2.0)
    )
    txt = MPNetModel(
        MPNetConfig(hidden_size=d, num_hidden_layers=text_layers,
                    num_attention_heads=2, intermediate_size=64, vocab_size=101,
                    max_position_embeddings=40),
        add_pooling_layer=False,
    )
    sd = {}
    for k, v in vis.state_dict().items():
        sd[f"vision_model.{k}"] = v.numpy()
    for k, v in align.state_dict().items():
        sd[f"align_transformer.transformer_layers.{k}"] = v.numpy()
    for k, v in txt.state_dict().items():
        sd[f"text_model.{k}"] = v.numpy()
    sd["loss_fns.RadZeroLoss.loss_temperature"] = np.array([np.log(0.07)], np.float32)
    sd["loss_fns.RadZeroLoss.layer_norm.weight"] = np.ones(d, np.float32)
    sd["loss_fns.RadZeroLoss.layer_norm.bias"] = np.zeros(d, np.float32)
    return sd


def test_convert_radzero_checkpoint_structure():
    sd = _fake_reference_state_dict()
    params = convert_radzero_checkpoint(sd, vision_layers=2, align_layers=1, text_layers=2)

    assert params["vision_model"]["layers"]["ln1"]["scale"].shape == (2, 32)
    assert params["align_transformer"]["layers"]["mlp"]["fc1"]["kernel"].shape == (1, 32, 64)
    assert params["text_model"]["rel_bias"].shape == (32, 2)
    lt = params["loss_fns"]["RadZeroLoss"]["log_loss_temperature"]
    np.testing.assert_allclose(lt, [np.log(0.07)], rtol=1e-6)


def test_convert_tool_cli_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    sd = _fake_reference_state_dict()
    src = tmp_path / "src"
    src.mkdir()
    save_file(sd, str(src / "model.safetensors"))

    dst = tmp_path / "dst"
    dst.mkdir()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "tools/convert_checkpoint.py", "--src", str(src),
         "--dst", str(dst), "--kind", "radzero"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stderr
    assert "converted radzero" in res.stdout
    assert os.path.isdir(dst / "state")


def test_convert_tool_carries_vocab(tmp_path):
    """vocab.txt next to the source weights lands in the output dir, so
    load_tokenizer(dst) resolves the first-party WordPieceTokenizer."""
    from safetensors.numpy import save_file

    sd = _fake_reference_state_dict()
    src = tmp_path / "src"
    src.mkdir()
    save_file(sd, str(src / "model.safetensors"))
    vocab = ["<s>", "<pad>", "</s>", "[UNK]", "there", "is", "effusion"]
    (src / "vocab.txt").write_text("\n".join(vocab) + "\n", encoding="utf-8")

    dst = tmp_path / "dst"
    dst.mkdir()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "tools/convert_checkpoint.py", "--src", str(src),
         "--dst", str(dst), "--kind", "radzero"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stderr
    assert (dst / "vocab.txt").read_text(encoding="utf-8").splitlines() == vocab

    from radzero_tpu.data.tokenizer import WordPieceTokenizer, load_tokenizer

    tok = load_tokenizer(str(dst), max_length=8)
    assert isinstance(tok, WordPieceTokenizer)
    ids, mask = tok(["there is effusion"])
    assert ids[0, 0] == 0 and ids[0, mask[0].sum() - 1] == 2

    # restorable into a matching pytree
    from radzero_tpu.train.checkpoint import restore_checkpoint

    target = convert_radzero_checkpoint(sd, 2, 1, 2)
    restored = restore_checkpoint(str(dst), target)
    np.testing.assert_allclose(
        restored["text_model"]["rel_bias"], target["text_model"]["rel_bias"], rtol=1e-6
    )
