"""Regression tests for the round-3 whole-repo review findings:

- xla align adapter must never see persistent lane padding (unmasked
  attention keys);
- packed-attention kernels fall back to the KV-blocked flash kernel
  past the per-program VMEM bound (SAM-length sequences);
- token-filter scatter-back rows are exact zeros (post final-LN);
- vocab writers preserve token ids across id gaps;
- DistributedInference rejects one-sided explicit rank args;
- ServingEngine.submit after close fails fast instead of hanging;
- TrainLoader stable_sharding pins per-process record shards;
- resolve_backend_impls downgrades Pallas impls off-TPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radzero_tpu.models.configuration import (
    AlignConfig,
    LossConfig,
    RadZeroConfig,
    TextConfig,
    ViTConfig,
)
from radzero_tpu.models.radzero import forward_vision, init_radzero

D = 32


def _cfg(vision_impl="flash", align_impl="xla"):
    return RadZeroConfig(
        vision=ViTConfig(
            hidden_size=D, num_hidden_layers=1, num_attention_heads=2,
            mlp_ratio=2.0, patch_size=14, pretrain_img_size=28, img_size=28,
            attn_impl=vision_impl,
        ),
        text=TextConfig(
            hidden_size=D, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=64, vocab_size=101, max_position_embeddings=40,
        ),
        align=AlignConfig(
            hidden_size=D, num_hidden_layers=1, num_attention_heads=2,
            mlp_ratio=2.0, attn_impl=align_impl,
        ),
        loss=LossConfig(hidden_dim=D),
    )


def test_xla_align_never_sees_lane_padding():
    """A padded producer (flash vision keeps 128-lane padding) feeding
    an UNMASKED consumer (xla align attention) must slice the padding
    off first: zero rows as attention keys would deflate every real
    token's softmax. Pin by parity with the all-xla path."""
    cfg_mixed = _cfg(vision_impl="flash", align_impl="xla")
    cfg_ref = _cfg(vision_impl="xla", align_impl="xla")
    params = init_radzero(jax.random.PRNGKey(0), cfg_mixed)
    rng = np.random.default_rng(0)
    pv = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32)

    out_mixed = forward_vision(params, cfg_mixed, pv)
    out_ref = forward_vision(params, cfg_ref, pv)
    np.testing.assert_allclose(
        np.asarray(out_mixed["vision_tokens"]),
        np.asarray(out_ref["vision_tokens"]),
        atol=2e-4, rtol=2e-4,
    )


def test_packed_attention_large_l_falls_back_to_flash(monkeypatch):
    """Past _PACKED_ATTN_MAX_LANES the packed kernels would blow the
    per-program VMEM cap (full (L, L) fp32 scores per image — SAM's
    L=4097 -> ~214 MB vs the 100 MB limit), invisible under CPU
    interpret mode. The dispatch must fall back to the KV-blocked flash
    kernel with identical semantics — including gradients."""
    from radzero_tpu.models import vit
    from radzero_tpu.ops.fused_layer import (
        flash_attention_packed,
        flash_attention_packed_vjp,
    )

    b, l, h, hd = 2, 200, 2, 8  # unaligned L: exercises the pad guard too
    d = h * hd
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.standard_normal((b, l, 3 * d)), jnp.float32)

    ref = vit._attn_packed(qkv, h, None, flash_attention_packed)
    monkeypatch.setattr(vit, "_PACKED_ATTN_MAX_LANES", 128)
    out = vit._attn_packed(qkv, h, None, flash_attention_packed)
    assert out.shape == (b, l, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # differentiable on the fallback path (training: fused_vjp/packed)
    g = jax.grad(
        lambda x: vit._attn_packed(x, h, None, flash_attention_packed_vjp).sum()
    )(qkv)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_token_filter_dropped_rows_are_exact_zeros():
    """Dropped patch rows must be exact zeros in the tower output: the
    scatter runs AFTER the final LayerNorm (LN of a zero row would emit
    the LN bias vector into the mean pool and align attention keys)."""
    from radzero_tpu.models.vit import init_vit, vit_forward

    cfg = ViTConfig(
        hidden_size=D, num_hidden_layers=2, num_attention_heads=2,
        mlp_ratio=2.0, patch_size=14, pretrain_img_size=28, img_size=42,
        attn_impl="xla", token_filter_ratio=0.5, token_filter_layer=1,
        use_final_layernorm=True,
    )
    params = init_vit(jax.random.PRNGKey(0), cfg)
    # nonzero LN bias: the pre-fix behavior would stamp it on dropped rows
    params["final_ln"]["bias"] = params["final_ln"]["bias"] + 0.5
    rng = np.random.default_rng(0)
    pv = jnp.asarray(rng.standard_normal((2, 42, 42, 3)), jnp.float32)
    out = np.asarray(vit_forward(params, cfg, pv))

    l_real = 1 + (42 // 14) ** 2                 # 10 tokens
    keep = 1 + max(1, int(round((l_real - 1) * 0.5)))
    zero_rows = (np.abs(out) < 1e-12).all(axis=-1).sum(axis=1)
    assert (zero_rows == l_real - keep).all()
    assert (np.abs(out).max(axis=-1) > 0).sum() == 2 * keep


def test_vocab_writers_preserve_ids_across_gaps(tmp_path):
    from radzero_tpu.data.tokenizer import _write_vocab_by_id, load_vocab_file

    vocab = {"<s>": 0, "hello": 2, "world": 5}
    path = str(tmp_path / "vocab.txt")
    _write_vocab_by_id(vocab, path)
    loaded = load_vocab_file(path)
    for tok, i in vocab.items():
        assert loaded[tok] == i
    assert loaded["[unused_gap_1]"] == 1  # gap filler occupies the line

    with pytest.raises(ValueError, match="duplicate id"):
        _write_vocab_by_id({"a": 0, "b": 0}, path)


def test_distributed_inference_rejects_one_sided_rank_args(tmp_path):
    from radzero_tpu.eval.distributed import DistributedInference

    with pytest.raises(ValueError, match="BOTH process_index"):
        DistributedInference([], [], [], str(tmp_path), process_index=1)
    with pytest.raises(ValueError, match="BOTH process_index"):
        DistributedInference([], [], [], str(tmp_path), process_count=4)
    # both explicit: accepted verbatim
    d = DistributedInference(
        [], [], [], str(tmp_path), process_index=2, process_count=4, run_id="t",
    )
    assert (d.process_index, d.process_count) == (2, 4)


def test_serving_submit_after_close_fails_fast():
    from radzero_tpu.data.processing import BlipStyleImageProcessor
    from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer
    from radzero_tpu.eval.serving import ServingEngine

    cfg = _cfg(vision_impl="xla", align_impl="xla")
    params = init_radzero(jax.random.PRNGKey(0), cfg)
    engine = ServingEngine(
        params, cfg, BlipStyleImageProcessor(size=28),
        WhitespaceHashTokenizer(vocab_size=101, max_length=8),
        max_batch=2, max_delay_ms=5, dtype=jnp.float32,
    )
    engine.register_prompt_set("cls", ["opacity"])
    engine.close()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (28, 28, 3), dtype=np.uint8)
    with pytest.raises(RuntimeError, match="closed"):
        engine.submit(img, "cls")


def _indices_per_epoch(loader, epochs):
    out = []
    for _ in range(epochs):
        seen = []
        for batch in loader:
            seen.extend(int(i) for i in batch["record_indices"])
        out.append(seen)
    return out


def test_stable_sharding_pins_process_shards():
    """With stable_sharding each process owns the SAME record set every
    epoch (the tower cache's hit precondition) in a different order;
    shards stay disjoint. The default reshuffle-then-stride gives a
    different subset per epoch — the behavior the tower-cache guard in
    RadZeroTrainer rejects."""
    from radzero_tpu.data.pipeline import PackSpec, TrainLoader

    records = [
        {"image": None, "key_phrases": [f"finding {i}"], "_i": i} for i in range(32)
    ]
    spec = PackSpec(max_sentences_per_image=1, max_text_tokens=8)

    def loader_for(pi, stable):
        return TrainLoader(
            records, lambda rec: np.zeros((28, 28, 3), np.uint8),
            lambda texts, L: (
                np.ones((len(texts), L), np.int32),
                np.ones((len(texts), L), np.int32),
            ),
            batch_size=4, spec=spec, seed=7, num_threads=2,
            process_index=pi, process_count=2, with_indices=True,
            stable_sharding=stable,
        )

    p0 = _indices_per_epoch(loader_for(0, True), 2)
    p1 = _indices_per_epoch(loader_for(1, True), 2)
    assert set(p0[0]) == set(p0[1]) and set(p1[0]) == set(p1[1])  # fixed shards
    assert p0[0] != p0[1]                                         # local reshuffle
    assert not (set(p0[0]) & set(p1[0]))                          # disjoint
    assert len(p0[0]) == len(p1[0]) == 16

    unstable = _indices_per_epoch(loader_for(0, False), 2)
    assert set(unstable[0]) != set(unstable[1])  # default: shard churns


def test_trainer_rejects_tower_cache_without_stable_sharding():
    from radzero_tpu.train.tower_cache import TowerCache
    from radzero_tpu.train.trainer import RadZeroTrainer, TrainerArgs

    class FakeLoader:
        process_count = 2
        stable_sharding = False

        def __len__(self):
            return 1

    cfg = _cfg(vision_impl="xla", align_impl="xla")
    args = TrainerArgs(output_dir="/tmp/x", num_train_epochs=1)
    with pytest.raises(ValueError, match="stable_sharding"):
        RadZeroTrainer(cfg, args, FakeLoader(), tower_cache=TowerCache("ram"))


def test_resolve_backend_impls_downgrades_off_tpu(monkeypatch):
    """On a backend without a Pallas lowering (gpu) the Pallas-only
    defaults must resolve to their XLA equivalents instead of crashing
    at the first pallas_call; on cpu/tpu the config passes untouched."""
    from radzero_tpu.models import configuration as C

    cfg = RadZeroConfig()  # flagship defaults: flash/fused_vjp/fuse_post/fused
    assert C.resolve_backend_impls(cfg) is cfg  # cpu (test backend): untouched

    monkeypatch.setattr(jax, "default_backend", lambda: "gpu")
    out = C.resolve_backend_impls(cfg)
    assert out.vision.attn_impl == "xla"
    assert out.align.attn_impl == "xla"
    assert out.text.attn_impl == "xla" and not out.text.fuse_post
    assert out.loss.train_impl == "xla"

    # alt towers without attn_impl pass through
    from radzero_tpu.models.mae_vit import MAEViTConfig

    alt = dataclasses.replace(
        cfg,
        vision=MAEViTConfig(hidden_size=D, num_hidden_layers=1,
                            num_attention_heads=2, patch_size=14, img_size=28),
    )
    out = C.resolve_backend_impls(alt)
    assert out.vision is alt.vision


def test_text_remat_override_plumbs_and_matches():
    """TextConfig.remat overrides the global remat flag for the text
    tower only (per-module granularity, mirrors AlignConfig.remat);
    gradients are identical either way — remat changes memory, not math."""
    from radzero_tpu.models.radzero import forward_train

    cfg = _cfg(vision_impl="xla", align_impl="xla")
    cfg_override = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, remat=False)
    )
    params = init_radzero(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32),
        "input_ids": jnp.asarray(rng.integers(3, 100, (4, 8)), jnp.int32),
        "attention_mask": jnp.ones((4, 8), jnp.int32),
        "group_map": jnp.asarray([0, 0, 1, 1], jnp.int32),
        "row_mask": jnp.ones((4,), jnp.float32),
    }

    def loss_fn(p, c):
        return forward_train(p, c, batch, remat=True)["losses"]["loss"]

    g_remat = jax.grad(lambda p: loss_fn(p, cfg))(params)
    g_override = jax.grad(lambda p: loss_fn(p, cfg_override))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        g_remat, g_override,
    )
