"""DINOv2-style Vision Transformer, TPU-native.

Functional re-design of the frozen XrayDINOv2 tower the reference uses
via HF ``Dinov2Model`` (exp/cxr_pt/model/vision_encoders.py:23-43,
modeling.py:96-123) and of the trainable align transformer
(``Dinov2Encoder``; exp/cxr_pt/model/align_transformers.py:23-45).

TPU-first choices:
- patch embedding as reshape + one big matmul (MXU) instead of a conv;
- transformer layers stacked along a leading axis and driven by
  ``lax.scan`` (one compiled layer body; fast compiles, remat-friendly);
- position embeddings stored at the checkpoint grid and bicubically
  interpolated to the runtime grid with fp32 matmul resize matrices
  (exact parity with HF ``interpolate_pos_encoding``: bicubic,
  align_corners=False, computed in fp32);
- fp32 softmax inside attention, bf16 everywhere else under training.

Layer math (HF Dinov2Layer, pre-LN with LayerScale):
    x = x + ls1 * attn_out(attn(ln1(x)))
    x = x + ls2 * mlp(ln2(x))
followed by an optional final LayerNorm (Dinov2Model has one; the raw
Dinov2Encoder used as align transformer does not).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from radzero_tpu.models.configuration import ViTConfig
from radzero_tpu.ops.layers import (
    attention,
    gelu,
    layer_norm,
    linear,
    merge_heads,
    split_heads,
)
from radzero_tpu.ops.resize import resize_matrix


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_linear(key, d_in, d_out, std=0.02):
    kk, _ = jax.random.split(key)
    return {
        "kernel": jax.random.normal(kk, (d_in, d_out), jnp.float32) * std,
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def _init_ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def init_vit_layers(key, cfg: ViTConfig) -> dict:
    """Stacked (num_layers leading axis) transformer layer params."""
    d, f, n = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers

    def one(k):
        ks = jax.random.split(k, 6)
        return {
            "ln1": _init_ln(d),
            "attn": {
                "q": _init_linear(ks[0], d, d),
                "k": _init_linear(ks[1], d, d),
                "v": _init_linear(ks[2], d, d),
                "o": _init_linear(ks[3], d, d),
            },
            "ls1": jnp.full((d,), cfg.layerscale_value, jnp.float32),
            "ln2": _init_ln(d),
            "mlp": {"fc1": _init_linear(ks[4], d, f), "fc2": _init_linear(ks[5], f, d)},
            "ls2": jnp.full((d,), cfg.layerscale_value, jnp.float32),
        }

    keys = jax.random.split(key, n)
    return jax.vmap(one)(keys)


def init_vit(key, cfg: ViTConfig) -> dict:
    d = cfg.hidden_size
    kp, kc, kpos, kl = jax.random.split(key, 4)
    patch_dim = cfg.patch_size * cfg.patch_size * cfg.num_channels
    params = {
        "patch_embed": _init_linear(kp, patch_dim, d),
        "cls_token": jax.random.normal(kc, (1, 1, d), jnp.float32) * 0.02,
        "pos_embed": jax.random.normal(kpos, (1, 1 + cfg.pos_grid**2, d), jnp.float32) * 0.02,
        "layers": init_vit_layers(kl, cfg),
    }
    if cfg.use_final_layernorm:
        params["final_ln"] = _init_ln(d)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def interpolate_pos_embed(pos_embed: jnp.ndarray, grid_hw: tuple[int, int]) -> jnp.ndarray:
    """Bicubic-resample patch pos-embeds to (h, w); CLS slot passes through.

    Mirrors HF ``Dinov2Embeddings.interpolate_pos_encoding``: reshape to
    (G, G, D), fp32 bicubic with align_corners=False, flatten back.
    """
    h, w = grid_hw
    n_pos = pos_embed.shape[1] - 1
    g = int(round(n_pos**0.5))
    if (h, w) == (g, g):
        return pos_embed
    cls_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:].astype(jnp.float32).reshape(1, g, g, -1)
    wh = jnp.asarray(resize_matrix(g, h, "bicubic"))
    ww = jnp.asarray(resize_matrix(g, w, "bicubic"))
    # (1,g,g,d) -> (1,h,w,d) separable, fp32, HIGHEST precision
    patch_pos = jnp.einsum("bghd,Hg->bHhd", patch_pos, wh, precision=jax.lax.Precision.HIGHEST)
    patch_pos = jnp.einsum("bHgd,Wg->bHWd", patch_pos, ww, precision=jax.lax.Precision.HIGHEST)
    patch_pos = patch_pos.reshape(1, h * w, -1).astype(pos_embed.dtype)
    return jnp.concatenate([cls_pos, patch_pos], axis=1)


def patchify(pixel_values: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, h*w, patch*patch*C) with (ph, pw, c) fastest-varying.

    The flattening order matches how the converter flattens the torch
    Conv2d kernel, so ``patches @ kernel`` == Conv2d(stride=patch).
    """
    b, hh, ww, c = pixel_values.shape
    h, w = hh // patch, ww // patch
    x = pixel_values.reshape(b, h, patch, w, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, h, w, ph, pw, c)
    return x.reshape(b, h * w, patch * patch * c)


def vit_embed(params: dict, cfg: ViTConfig, pixel_values: jnp.ndarray, dtype) -> jnp.ndarray:
    b, hh, ww, _ = pixel_values.shape
    grid = (hh // cfg.patch_size, ww // cfg.patch_size)
    x = patchify(pixel_values.astype(dtype), cfg.patch_size)
    x = linear(x, params["patch_embed"])
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    pos = interpolate_pos_embed(params["pos_embed"], grid)
    return x + pos.astype(dtype)


def _packed_qkv_params(a: dict, dtype=None):
    """Concatenate per-head q/k/v projections into the packed
    [q | k | v] layout the fused/packed attention kernels consume.
    ``dtype=None`` keeps the stored dtype (serving params are already in
    the compute dtype); trainable paths pass the compute dtype so the
    cast sits on the tape like the unfused ``linear`` path."""
    wqkv = jnp.concatenate(
        [a["q"]["kernel"], a["k"]["kernel"], a["v"]["kernel"]], axis=1
    )
    bqkv = jnp.concatenate([a["q"]["bias"], a["k"]["bias"], a["v"]["bias"]])
    if dtype is not None:
        wqkv, bqkv = wqkv.astype(dtype), bqkv.astype(dtype)
    return wqkv, bqkv


# Per-program VMEM bound for the packed-layout kernels: each program
# holds the full (L_pad, L_pad) fp32 score matrix plus the iota column
# mask and the exp buffer in VMEM (~63 MB at 2048 lanes against the
# 100 MB compiler cap). Longer sequences — e.g. a SAM tower's L=4097
# (-> 4224 lanes, ~214 MB of score buffers) feeding a fused align
# adapter — would fail Mosaic VMEM allocation on a real TPU (CPU
# interpret mode enforces no limit, so tests alone can't catch it);
# they fall back to the KV-blocked flash kernel, which is VMEM-bounded
# by construction and differentiable (custom VJP), trading the packed
# layout's transpose savings for correctness at scale.
_PACKED_ATTN_MAX_LANES = 2048


def _attn_packed(qkv: jnp.ndarray, n_heads: int, real_len, attn_fn) -> jnp.ndarray:
    """Call a packed-layout attention kernel, lane-padding first when a
    standalone (unpadded) sequence arrives: the kernels require
    L % 128 == 0 with padded key columns masked via the real length.
    This is the single pad/mask guard shared by the serving ('fused')
    and trainable ('fused_vjp'/'packed') paths — e.g. an alt vision
    tower (CLIP L=577, SAM L=4097) feeding a fused align adapter lands
    here with real_len=None and a non-lane-aligned L."""
    l = qkv.shape[1]
    l_pad = l if l % 128 == 0 else (l + 127) // 128 * 128
    if l_pad > _PACKED_ATTN_MAX_LANES:
        from radzero_tpu.ops.flash_attention import flash_attention

        d = qkv.shape[2] // 3
        q = split_heads(qkv[..., :d], n_heads)
        k = split_heads(qkv[..., d : 2 * d], n_heads)
        v = split_heads(qkv[..., 2 * d :], n_heads)
        return merge_heads(flash_attention(q, k, v, None, None, real_len))
    if real_len is None and l_pad != l:
        qkv = jnp.pad(qkv, ((0, 0), (0, l_pad - l), (0, 0)))
        return attn_fn(qkv, n_heads, l)[:, :l]
    return attn_fn(qkv, n_heads, real_len)


def dinov2_layer_fused(
    x: jnp.ndarray, p: dict, cfg: ViTConfig, real_len: int = None
) -> jnp.ndarray:
    """Serving-path block: Pallas-fused ln1+packed-QKV and
    proj+residual+ln2+MLP+residual around the flash attention kernel
    (ops/fused_layer.py). FORWARD-ONLY — no VJP; the trainable align
    layers must use 'flash'/'xla'. Numerically equivalent to
    :func:`dinov2_layer` (fp32 LN/GELU, bf16 MXU operands)."""
    from radzero_tpu.ops.fused_layer import (
        flash_attention_packed,
        fused_postattn,
        fused_preattn,
    )

    b, l, d = x.shape
    cdt = x.dtype
    x2 = x.reshape(b * l, d)
    # cast params to the compute dtype (a no-op on the serving path,
    # whose param tree is pre-cast): the kernels dot the activation
    # against the weight AT ITS STORED DTYPE, so an fp32 weight — the
    # trainer's frozen-tower substitution and make_tower_fn hold fp32
    # trees — would silently demote every GEMM to the fp32 MXU rate
    # and double the weight HBM/VMEM traffic
    wqkv, bqkv = _packed_qkv_params(p["attn"], cdt)
    a = p["attn"]
    qkv = fused_preattn(
        x2, p["ln1"]["scale"].astype(cdt), p["ln1"]["bias"].astype(cdt),
        wqkv, bqkv,
        eps=cfg.layer_norm_eps,
    ).reshape(b, l, 3 * d)
    attn_out = _attn_packed(
        qkv, cfg.num_attention_heads, real_len, flash_attention_packed
    )
    out = fused_postattn(
        x2, attn_out.reshape(b * l, d),
        a["o"]["kernel"].astype(cdt), a["o"]["bias"].astype(cdt),
        p["ls1"].astype(cdt),
        p["ln2"]["scale"].astype(cdt), p["ln2"]["bias"].astype(cdt),
        p["mlp"]["fc1"]["kernel"].astype(cdt), p["mlp"]["fc1"]["bias"].astype(cdt),
        p["mlp"]["fc2"]["kernel"].astype(cdt), p["mlp"]["fc2"]["bias"].astype(cdt),
        p["ls2"].astype(cdt),
        eps=cfg.layer_norm_eps,
    )
    return out.reshape(b, l, d)


def dinov2_layer(
    x: jnp.ndarray, p: dict, cfg: ViTConfig, real_len: int = None
) -> jnp.ndarray:
    """One block; ``real_len`` (static) marks real tokens when the
    sequence axis carries persistent lane padding (flash impl only)."""
    if cfg.attn_impl == "fused":
        return dinov2_layer_fused(x, p, cfg, real_len)
    if cfg.attn_impl == "fused_vjp":
        # trainable twin of the fused serving layer: identical forward
        # kernels with custom Pallas backwards (ops/fused_layer.py) —
        # the LN/GELU intermediates never exist in HBM in either pass,
        # and the only autodiff residuals are (x, qkv, attn_out)
        from radzero_tpu.ops.fused_layer import (
            flash_attention_packed_vjp,
            fused_postattn_vjp,
            fused_preattn_vjp,
        )

        b, l, d = x.shape
        cdt = x.dtype
        a = p["attn"]
        wqkv, bqkv = _packed_qkv_params(a, cdt)
        x2 = x.reshape(b * l, d)
        qkv = fused_preattn_vjp(
            x2, p["ln1"]["scale"].astype(cdt), p["ln1"]["bias"].astype(cdt),
            wqkv, bqkv, cfg.layer_norm_eps,
        ).reshape(b, l, 3 * d)
        attn_out = _attn_packed(
            qkv, cfg.num_attention_heads, real_len, flash_attention_packed_vjp
        )
        attn_out = checkpoint_name(attn_out, "attn_out")
        out = fused_postattn_vjp(
            x2, attn_out.reshape(b * l, d),
            a["o"]["kernel"].astype(cdt), a["o"]["bias"].astype(cdt),
            p["ls1"].astype(cdt),
            p["ln2"]["scale"].astype(cdt), p["ln2"]["bias"].astype(cdt),
            p["mlp"]["fc1"]["kernel"].astype(cdt), p["mlp"]["fc1"]["bias"].astype(cdt),
            p["mlp"]["fc2"]["kernel"].astype(cdt), p["mlp"]["fc2"]["bias"].astype(cdt),
            p["ls2"].astype(cdt), cfg.layer_norm_eps,
        )
        return out.reshape(b, l, d)
    h = layer_norm(x, p["ln1"], cfg.layer_norm_eps)
    if cfg.attn_impl == "packed":
        # trainable analog of the fused serving layout: one packed-QKV
        # GEMM feeding the transpose-free packed attention custom VJP
        # (ops/fused_layer.py) — no (B, L, H, hd) <-> (B*H, L, hd) head
        # round trips in forward, backward, or the remat recompute
        from radzero_tpu.ops.fused_layer import flash_attention_packed_vjp

        wqkv, bqkv = _packed_qkv_params(p["attn"], h.dtype)
        qkv = jnp.dot(h, wqkv) + bqkv
        a = checkpoint_name(
            _attn_packed(
                qkv, cfg.num_attention_heads, real_len,
                flash_attention_packed_vjp,
            ),
            "attn_out",
        )
    else:
        q = split_heads(linear(h, p["attn"]["q"]), cfg.num_attention_heads)
        k = split_heads(linear(h, p["attn"]["k"]), cfg.num_attention_heads)
        v = split_heads(linear(h, p["attn"]["v"]), cfg.num_attention_heads)
        if cfg.attn_impl == "flash":
            from radzero_tpu.ops.flash_attention import flash_attention

            a = merge_heads(flash_attention(q, k, v, None, None, real_len))
        else:
            a = merge_heads(attention(q, k, v))
        a = checkpoint_name(a, "attn_out")
    a = linear(a, p["attn"]["o"])
    x = x + a * p["ls1"].astype(x.dtype)

    m = layer_norm(x, p["ln2"], cfg.layer_norm_eps)
    m = linear(m, p["mlp"]["fc1"])
    m = gelu(m)
    m = linear(m, p["mlp"]["fc2"])
    return x + m * p["ls2"].astype(x.dtype)


def vit_encoder(
    layers: dict,
    cfg: ViTConfig,
    x: jnp.ndarray,
    remat: bool = False,
    real_len: int = None,
) -> jnp.ndarray:
    """Scan the stacked layers over x (B, L, D)."""

    def body(h, layer_params):
        fn = dinov2_layer
        if remat:
            if cfg.remat_policy == "save_attn":
                # keep the attention output live: the backward recompute
                # shrinks to the pre-attention GEMM (see
                # ViTConfig.remat_policy); ~140 MB extra per layer at
                # the flagship align shapes
                fn = jax.checkpoint(
                    dinov2_layer, static_argnums=(2, 3),
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "attn_out"
                    ),
                )
            else:
                fn = jax.checkpoint(dinov2_layer, static_argnums=(2, 3))
        return fn(h, layer_params, cfg, real_len), None

    x, _ = jax.lax.scan(body, x, layers)
    return x


def pad_seq_to_lanes(x: jnp.ndarray, lane: int = 128):
    """Zero-pad (B, L, D) to a lane-multiple L; -> (x_padded, real_len)."""
    l = x.shape[1]
    l_pad = (l + lane - 1) // lane * lane
    if l_pad == l:
        return x, None
    return jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0))), l


def _token_filter(x, layer_p, cfg: ViTConfig, real_len):
    """Attention-aware token filter (PAPERS.md arXiv 2506.01519, opt-in):
    rank patch tokens by the head-mean CLS attention score computed from
    the NEXT layer's q/k projections, keep the top (1 - ratio) fraction
    (CLS always kept), return the gathered sequence lane-padded for the
    remaining layers plus the keep indices for scatter-back."""
    b, l_pad, d = x.shape
    l_real = real_len if real_len is not None else l_pad
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    keep = max(1, int(round((l_real - 1) * (1.0 - cfg.token_filter_ratio))))

    h = layer_norm(x, layer_p["ln1"], cfg.layer_norm_eps)
    q_cls = linear(h[:, :1], layer_p["attn"]["q"]).reshape(b, nh, hd)
    keys = linear(h, layer_p["attn"]["k"]).reshape(b, l_pad, nh, hd)
    scores = jnp.einsum("bhd,blhd->bl", q_cls, keys) * (hd**-0.5) / nh
    col = jnp.arange(l_pad)[None, :]
    scores = jnp.where((col >= 1) & (col < l_real), scores, -jnp.inf)
    _, idx = jax.lax.top_k(scores, keep)               # (B, keep) patch rows
    idx = jnp.sort(idx, axis=1)                        # spatial order, stable
    idx = jnp.concatenate([jnp.zeros((b, 1), idx.dtype), idx], axis=1)

    new_real = 1 + keep
    # lane padding only on the masked (flash/fused) path; the xla path
    # has no key mask, so padded rows would corrupt the softmax there
    new_pad = (new_real + 127) // 128 * 128 if real_len is not None else new_real
    gathered = jnp.take_along_axis(x, idx[..., None], axis=1)
    if new_pad != new_real:
        gathered = jnp.pad(gathered, ((0, 0), (0, new_pad - new_real), (0, 0)))
    return gathered, idx, new_real


def vit_forward(
    params: dict,
    cfg: ViTConfig,
    pixel_values: jnp.ndarray,
    *,
    dtype=jnp.float32,
    remat: bool = False,
    keep_padded: bool = False,
) -> jnp.ndarray:
    """Full tower: (B, H, W, C) NHWC float -> (B, 1+h*w, D) tokens.

    Equivalent to HF ``Dinov2Model(pixel_values).last_hidden_state``
    (ref modeling.py:98-99) with the final LayerNorm applied when
    ``cfg.use_final_layernorm``.

    Under the flash path the sequence is lane-padded ONCE before the
    encoder (padded keys are masked in attention; padded rows are inert
    and sliced off) instead of per attention call — a ~12% tower win.
    ``keep_padded`` leaves the padding on for a downstream padded
    consumer (the align adapter); callers slice with the known length.
    """
    x = vit_embed(params, cfg, pixel_values, dtype)
    real_len = None
    if cfg.attn_impl in ("flash", "fused", "packed", "fused_vjp"):
        x, real_len = pad_seq_to_lanes(x)
    filtered = None
    if cfg.token_filter_ratio > 0.0:
        k = cfg.token_filter_layer
        if not 0 <= k < cfg.num_hidden_layers:
            # jax.tree.map(lambda a: a[k], ...) would silently CLAMP an
            # out-of-range static index to the last layer — make the
            # misconfiguration loud instead
            raise ValueError(
                f"token_filter_layer={k} out of range for "
                f"num_hidden_layers={cfg.num_hidden_layers}"
            )
        layers = params["layers"]
        head = jax.tree.map(lambda a: a[:k], layers)
        tail = jax.tree.map(lambda a: a[k:], layers)
        l_pad_full = x.shape[1]
        x = vit_encoder(head, cfg, x, remat=remat, real_len=real_len)
        x, idx, new_real = _token_filter(
            x, jax.tree.map(lambda a: a[k], layers), cfg, real_len
        )
        x = vit_encoder(tail, cfg, x, remat=remat, real_len=new_real)
        filtered = (idx, new_real, l_pad_full)
    else:
        x = vit_encoder(params["layers"], cfg, x, remat=remat, real_len=real_len)
    if cfg.use_final_layernorm:
        x = layer_norm(x, params["final_ln"], cfg.layer_norm_eps)
    if filtered is not None:
        # scatter kept rows back to the full grid so align/map shapes
        # downstream are unchanged. AFTER the final LN, so dropped rows
        # are exact zeros — LN of a zero row would emit the LN bias
        # vector, contaminating the mean pool and align attention keys.
        idx, new_real, l_pad_full = filtered
        b = x.shape[0]
        full = jnp.zeros((b, l_pad_full, x.shape[-1]), x.dtype)
        x = full.at[jnp.arange(b)[:, None], idx].set(x[:, :new_real])
    if real_len is not None and not keep_padded:
        x = x[:, :real_len]
    return x
