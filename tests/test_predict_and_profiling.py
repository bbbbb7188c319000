"""Trainer predict loop + profiling utils."""

import time

import numpy as np

from radzero_tpu.utils.profiling import StepTimer, speed_metrics, trace


def test_speed_metrics():
    t0 = time.perf_counter() - 2.0
    m = speed_metrics("train", t0, num_samples=100, num_steps=10)
    assert m["train_samples_per_second"] > 0
    assert m["train_steps_per_second"] > 0


def test_step_timer():
    t = StepTimer()
    with t:
        time.sleep(0.01)
    with t:
        time.sleep(0.01)
    assert t.count == 2 and t.mean >= 0.009


def test_trace_noop():
    with trace(None):
        pass


def test_trainer_predict_loop(tmp_path):
    import jax.numpy as jnp

    from radzero_tpu.data.pipeline import PackSpec, TrainLoader
    from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer
    from radzero_tpu.models.configuration import (
        AlignConfig, LossConfig, RadZeroConfig, TextConfig, ViTConfig,
    )
    from radzero_tpu.models.radzero import forward_vision
    from radzero_tpu.train.trainer import RadZeroTrainer, TrainerArgs

    D = 32
    cfg = RadZeroConfig(
        vision=ViTConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2,
                         mlp_ratio=2.0, patch_size=14, pretrain_img_size=28, img_size=28),
        text=TextConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=64, vocab_size=101, max_position_embeddings=40),
        align=AlignConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0),
        loss=LossConfig(hidden_dim=D),
    )
    recs = [{"key_phrases": [f"finding {i}"], "image": i} for i in range(16)]
    tok = WhitespaceHashTokenizer(vocab_size=101, max_length=8)
    loader = TrainLoader(
        recs, lambda r: np.zeros((28, 28, 3), np.float32), tok, 8,
        PackSpec(1, 8), shuffle=False, num_threads=1,
    )
    trainer = RadZeroTrainer(cfg, TrainerArgs(output_dir=str(tmp_path), bf16=False), loader, None)

    def inference_step(params, batch):
        v = forward_vision(params, cfg, batch["pixel_values"], dtype=jnp.float32)
        return {"image_features": v["image_features"]}

    out = trainer.predict(loader, inference_step)
    assert out["image_features"].shape == (16, 2 * D)
