"""Config-system tests: YAML overlay deep-merge semantics (ref common/utils.py:21-62)."""

import os

from radzero_tpu.config import load_config, update_nested_dict

PKG = os.path.join(os.path.dirname(__file__), "..", "radzero_tpu", "config")


def test_update_nested_dict_leaf_override():
    a = {"x": {"y": 1, "z": 2}, "k": 3}
    update_nested_dict(a, {"x": {"y": 10}, "new": 4})
    assert a == {"x": {"y": 10, "z": 2}, "k": 3, "new": 4}


def test_update_nested_dict_dict_replaces_scalar():
    a = {"x": 1}
    update_nested_dict(a, {"x": {"y": 2}})
    assert a == {"x": {"y": 2}}


def test_load_defaults_with_radzero_overlay():
    cfg = load_config(os.path.join(PKG, "defaults.yaml"), ["radzero", "paths"])
    # overlay wins on leaves
    assert cfg["train"]["per_device_train_batch_size"] == 64
    assert cfg["train"]["num_train_epochs"] == 20
    # base leaves survive
    assert cfg["train"]["weight_decay"] == 0.05
    assert cfg["train"]["warmup_steps"] == 50
    # model preset present
    mc = cfg["model"]["model_config"]
    assert mc["vision_config"]["img_size"] == 518
    assert mc["loss"]["RadZeroLoss"]["sim_op"] == "cos"
    assert mc["align_transformer_config"]["num_hidden_layers"] == 2
    # paths overlay applied last
    assert cfg["dataset"]["data_root"] == "/data"


def test_ordered_overlays_later_wins(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("a: {b: 1, c: 2}\n")
    cfgdir = tmp_path / "configs"
    cfgdir.mkdir()
    (cfgdir / "one.yaml").write_text("a: {b: 5}\n")
    (cfgdir / "two.yaml").write_text("a: {b: 9, d: 7}\n")
    cfg = load_config(str(base), ["one", "two"])
    assert cfg["a"] == {"b": 9, "c": 2, "d": 7}
