"""MPNet text-tower parity vs HF MPNetModel (the reference's text encoder)."""

import numpy as np
import torch

from radzero_tpu.models.configuration import TextConfig
from radzero_tpu.models.convert import convert_mpnet
from radzero_tpu.models.mpnet import masked_mean_pool, mpnet_forward

SMALL = dict(
    hidden_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=128,
    vocab_size=211,
    max_position_embeddings=66,
    relative_attention_num_buckets=32,
    layer_norm_eps=1e-12,
    pad_token_id=1,
)


def _hf_model():
    from transformers.models.mpnet.configuration_mpnet import MPNetConfig
    from transformers.models.mpnet.modeling_mpnet import MPNetModel

    cfg = MPNetConfig(
        hidden_size=SMALL["hidden_size"],
        num_hidden_layers=SMALL["num_hidden_layers"],
        num_attention_heads=SMALL["num_attention_heads"],
        intermediate_size=SMALL["intermediate_size"],
        vocab_size=SMALL["vocab_size"],
        max_position_embeddings=SMALL["max_position_embeddings"],
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    return MPNetModel(cfg, add_pooling_layer=False).eval()


def _random_batch(rng, n=5, max_len=23):
    """Variable-length sequences padded with pad_token_id=1 (bos=0, eos=2)."""
    ids = np.full((n, max_len), SMALL["pad_token_id"], dtype=np.int64)
    mask = np.zeros((n, max_len), dtype=np.int64)
    for i in range(n):
        length = int(rng.integers(3, max_len + 1))
        ids[i, :length] = rng.integers(3, SMALL["vocab_size"], size=length)
        ids[i, 0] = 0
        ids[i, length - 1] = 2
        mask[i, :length] = 1
    return ids, mask


def test_mpnet_matches_hf():
    model = _hf_model()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = TextConfig(**SMALL)
    params = convert_mpnet(sd, cfg.num_hidden_layers)

    rng = np.random.default_rng(0)
    ids, mask = _random_batch(rng)

    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    out = np.asarray(mpnet_forward(params, cfg, ids, mask))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-5)


def test_mpnet_pack_qkv_matches_separate():
    """pack_qkv folds q/k/v into one (D, 3D) GEMM at trace time; params
    keep the reference layout, outputs and gradients must match."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from radzero_tpu.models.mpnet import init_mpnet

    cfg = TextConfig(**SMALL)
    cfgp = dataclasses.replace(cfg, pack_qkv=True)
    params = init_mpnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    ids, mask = _random_batch(rng)

    out = np.asarray(mpnet_forward(params, cfg, ids, mask))
    outp = np.asarray(mpnet_forward(params, cfgp, ids, mask))
    np.testing.assert_allclose(outp, out, rtol=1e-6, atol=1e-6)

    def loss(p, c):
        return jnp.sum(mpnet_forward(p, c, ids, mask) ** 2)

    g = jax.grad(loss)(params, cfg)
    gp = jax.grad(loss)(params, cfgp)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5)


def test_masked_mean_pool_matches_reference_math():
    """Sentence pooling: sum(h*mask)/clamp(sum(mask), 1e-9) (ref modeling.py:146-156)."""
    rng = np.random.default_rng(1)
    h = rng.standard_normal((4, 7, 16)).astype(np.float32)
    mask = (rng.random((4, 7)) > 0.4).astype(np.float32)
    mask[:, 0] = 1.0

    ref = (h * mask[..., None]).sum(1) / np.clip(mask.sum(1)[:, None], 1e-9, None)
    out = np.asarray(masked_mean_pool(h, mask))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
