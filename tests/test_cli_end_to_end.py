"""CLI end-to-end smoke test: tiny config -> train 1 epoch -> zero-shot eval.

Exercises the full L6->L0 stack of cli/run.py on synthetic data,
mirroring the reference entry flow (run.py:77-169)."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest
import yaml
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    data = root / "data"
    (data / "MIMIC-CXR" / "images").mkdir(parents=True)
    (data / "MS-CXR").mkdir()
    (data / "Chexpert").mkdir()
    rng = np.random.default_rng(0)

    rows = []
    for i in range(16):
        name = f"img_{i}.jpg"
        Image.fromarray(
            rng.integers(0, 256, (40, 36, 3), dtype=np.uint8)
        ).save(data / "MIMIC-CXR" / "images" / name)
        rows.append(
            {
                "dicom_id": name,
                "view_position": "PA",
                "key_phrases": [f"There is finding {i}", f"There is no other finding {i}"],
            }
        )
    with open(data / "MIMIC-CXR" / "train.json", "w") as f:
        json.dump(rows, f)
    with open(data / "MIMIC-CXR" / "validate.json", "w") as f:
        json.dump(rows[:8], f)
    with open(data / "MS-CXR" / "test.json", "w") as f:
        json.dump([], f)

    # minimal Chexpert classification set
    pd.DataFrame({"Path": [f"MIMIC-CXR/images/img_{i}.jpg" for i in range(8)]}).to_csv(
        data / "Chexpert" / "chexpert5_test_image.csv", index=False
    )
    classes = ["Atelectasis", "Cardiomegaly", "Consolidation", "Edema", "Pleural Effusion"]
    with open(data / "Chexpert" / "chexpert5_test_text.json", "w") as f:
        json.dump({str(i): [f"There is {c}"] for i, c in enumerate(classes)}, f)
    labels = rng.integers(0, 2, (8, 5))
    labels[0] = 1
    labels[1] = 0
    pd.DataFrame(labels, columns=classes).to_csv(data / "Chexpert" / "test_labels.csv", index=False)

    cfg = {
        "train": {
            "learning_rate": 1e-4, "per_device_train_batch_size": 8,
            "per_device_eval_batch_size": 8, "num_train_epochs": 1,
            "weight_decay": 0.05, "max_grad_norm": 1.0, "warmup_steps": 1,
            "logging_steps": 1, "seed": 0, "bf16": False,
            "mesh": {"data": 1}, "max_sentences_per_image": 2, "max_text_tokens": 12,
            # data echoing (train.echo -> TrainLoader(echo=...)): 16
            # records / batch 8 = 2 decoded batches -> 4 optimizer steps
            "echo": 2,
        },
        "experiment": {
            "project": "pt", "name": "smoke", "user": "debug",
            "output_root_dir": str(root / "out"), "early_stopping_patience": 5,
            "resume_from_checkpoint": False, "report_to": "none",
        },
        "dataset": {
            "data_root": str(data), "train": ["T"], "eval": ["E"],
            "T": "MIMIC-CXR/train.json", "E": "MIMIC-CXR/validate.json",
            "rm_mscxr": False, "MS_CXR_test": "MS-CXR/test.json",
            "use_frontal_view_only": False,
        },
        "inference": {
            "batch_size": 8, "cls_dataset": ["Chexpert"], "det_dataset": [],
            "seg_dataset": [], "compute_pixel_level_auroc": False,
        },
        "model": {
            "module_to_update": ["align_transformer", "text_model", "loss_fns"],
            "pretrained_ckpt": None,
            "model_config": {
                "vision_config": {
                    "model_type": "dinov2", "img_size": 28, "patch_size": 14,
                    "hidden_size": 32, "num_hidden_layers": 1, "num_attention_heads": 2,
                    "mlp_ratio": 2.0, "pretrain_img_size": 28,
                    "pretrained_name_or_path": None,
                },
                "text_config": {
                    "model_type": "mpnet", "hidden_size": 32, "num_hidden_layers": 1,
                    "num_attention_heads": 2, "intermediate_size": 64,
                    "vocab_size": 30527, "max_position_embeddings": 40,
                    "pretrained_tokenizer_name_or_path": None, "use_cls_token": False,
                },
                "align_transformer_config": {
                    "model_type": "align_transformer", "hidden_size": 32,
                    "num_hidden_layers": 1, "num_attention_heads": 2, "mlp_ratio": 2.0,
                },
                "loss": {
                    "apply": ["RadZeroLoss"], "ratio": [1.0],
                    "RadZeroLoss": {"hidden_dim": 32, "sim_op": "cos"},
                },
                "compute_logits_type": "radzero",
            },
        },
    }
    cfg_path = root / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return root, cfg_path


def test_cli_train_and_eval(workspace):
    root, cfg_path = workspace
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        # The child's first jit (interpret-mode Pallas on CPU) has stalled
        # past 600 s under full-suite host contention (judged flaky in r2):
        # cache compiles across runs and keep a generous margin.
        JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache"),
    )
    import time

    t0 = time.monotonic()
    res = subprocess.run(
        [sys.executable, "-m", "radzero_tpu.cli.run", "--cfg_path", str(cfg_path),
         "--train", "true", "--inference", "true", "--no_report"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800,
    )
    elapsed = time.monotonic() - t0
    assert res.returncode == 0, (
        f"rc={res.returncode} after {elapsed:.0f}s\n" + res.stderr[-3000:]
    )

    out_dir = root / "out" / "pt" / "debug" / "smoke"
    assert (out_dir / "output.log").exists()
    assert (out_dir / "snapshot" / "config.yaml").exists()
    ckpts = [d for d in os.listdir(out_dir) if d.startswith("checkpoint-")]
    assert ckpts, os.listdir(out_dir)
    result = out_dir / "inference" / "classification" / "result.json"
    assert result.exists(), res.stdout[-2000:]
    perf = json.load(open(result))
    assert "Chexpert" in perf

    # train.echo=2 doubled the optimizer steps: 2 decoded batches
    # (16 records / batch 8, drop_last) x echo 2 = 4 step records
    steps = [
        json.loads(l)["step"]
        for l in open(out_dir / "log_history.jsonl")
        if "step" in json.loads(l)
    ]
    assert max(steps) == 4, steps
