"""Model configuration dataclasses.

Replaces the reference's HF ``PretrainedConfig`` composition
(exp/cxr_pt/model/configuration.py:6-129) with frozen dataclasses that
are hashable (usable as static jit args) and built from the same nested
config dicts produced by the YAML overlay system.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

_REMAT_POLICIES = (None, "save_attn")


def _check_remat_policy(policy: Optional[str]) -> None:
    """Reject unknown remat policies at config-build time: an unmatched
    value (e.g. a YAML typo like 'save-attn') would otherwise silently
    fall through to full per-layer recompute in vit_encoder's remat
    branch, so a misconfigured run would train/measure the wrong policy
    with no signal."""
    if policy not in _REMAT_POLICIES:
        raise ValueError(
            f"unknown remat_policy {policy!r}; expected one of {_REMAT_POLICIES}"
        )


@dataclass(frozen=True)
class ViTConfig:
    """DINOv2-style ViT encoder config (HF Dinov2Config subset)."""

    model_type: str = "dinov2"    # dinov2 | raddino (same architecture)
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    mlp_ratio: float = 4.0
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-6
    layerscale_value: float = 1.0
    pretrain_img_size: int = 224  # grid the stored pos-embeds correspond to
    img_size: int = 518           # runtime resolution (ref radzero.yaml:19)
    use_final_layernorm: bool = True  # Dinov2Model applies a final LN
    # flash (Pallas) | xla (eager einsum) | packed (transpose-free
    # trainable layout, ops/fused_layer.py — wins when the tower itself
    # is trained) | fused (forward-only serving kernels; inference
    # surfaces switch to it via with_fused_towers)
    attn_impl: str = "flash"
    # Attention-aware token filtering (PAPERS.md: arXiv 2506.01519),
    # OPT-IN accuracy/speed trade for serving, default OFF. At layer
    # ``token_filter_layer`` patch tokens are ranked by head-mean CLS
    # attention score and only the top (1 - ratio) fraction continue
    # through the remaining layers; dropped rows are scattered back as
    # exact zeros after the final LN so every downstream shape (align,
    # similarity maps) is unchanged. Measured trade-offs:
    # tools/token_filter_study.py.
    token_filter_ratio: float = 0.0
    token_filter_layer: int = 6
    # Remat granularity when the encoder runs under ``remat=True``:
    # None -> full per-layer recompute (jax.checkpoint, the default);
    # "save_attn" -> jax.checkpoint with
    # ``save_only_these_names("attn_out")`` — the attention output stays
    # live, so the backward recompute shrinks to the pre-attention
    # GEMM (the packed-attention custom VJP's only residual is qkv and
    # the fused pre/post VJPs save exactly their inputs, so the
    # attention-forward and post-attention/MLP recomputes are dead-code
    # eliminated). Costs one extra live (B, L, D) per layer — ~140 MB at
    # the flagship align shapes vs the ~700 MB/layer that a full
    # no-remat (AlignConfig.remat=False) keeps, which OOMs a 16 GB v5e
    # at batch 64.
    remat_policy: Optional[str] = None

    def __post_init__(self):
        _check_remat_policy(self.remat_policy)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def intermediate_size(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    @property
    def pos_grid(self) -> int:
        return self.pretrain_img_size // self.patch_size

    @property
    def patch_grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return 1 + self.patch_grid * self.patch_grid


@dataclass(frozen=True)
class AlignConfig:
    """Align-transformer config: N extra trainable DINOv2 layers
    (ref exp/cxr_pt/model/align_transformers.py:23-45, radzero.yaml:29-34)."""

    model_type: str = "align_transformer"  # align_transformer | identity | linear | mlp
    hidden_size: int = 768
    num_hidden_layers: int = 2
    num_attention_heads: int = 12
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    layerscale_value: float = 1.0
    use_layer_norm: bool = False  # optional trailing LN (radzero.yaml:34: False)
    # None -> follow the caller's global remat flag; True/False forces
    # rematerialisation for the adapter layers only (per-module remat
    # granularity — the adapter's saved activations are tiny next to
    # the text tower's, so disabling its recompute is cheap in HBM)
    remat: Optional[bool] = None
    # fused_vjp (default) | packed | flash | xla | fused (forward-only
    # serving). "fused_vjp" = the trainable twin of the fused serving
    # layer: ln1+packed-QKV and proj+res+ln2+MLP+res each run as one
    # Pallas kernel pair with custom backwards (ops/fused_layer.py) —
    # no LN/GELU intermediates in HBM in either pass. Measured full
    # train step at the flagship recipe (batch 64, bf16 + remat,
    # tools/bench_train.py): 114.5 samples/s vs 112.0 (packed) at the
    # L64 slot. These are the TRAINABLE layers, so unlike the frozen
    # tower they need the VJP variants of the fused kernels.
    attn_impl: str = "fused_vjp"
    # see ViTConfig.remat_policy (None | "save_attn"); applies to the
    # adapter layers when they run under remat. Default "save_attn":
    # keeping the attention output live shrinks the backward recompute
    # to the pre-attn GEMM — measured on-chip it recovers about half of
    # remat's cost on the segment (126.2 -> 117.6 ms in isolation,
    # tools/profile_align.py) and +2.8% on the full uncached step at
    # the L32 bucket (149.8 -> 154.0 samples/s, round 5) for a few MB
    # of HBM. Irrelevant when the adapter runs no-remat (cached mode).
    remat_policy: Optional[str] = "save_attn"

    def __post_init__(self):
        _check_remat_policy(self.remat_policy)

    def as_vit(self) -> ViTConfig:
        return ViTConfig(
            hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            mlp_ratio=self.mlp_ratio,
            layer_norm_eps=self.layer_norm_eps,
            layerscale_value=self.layerscale_value,
            use_final_layernorm=False,
            attn_impl=self.attn_impl,
            remat_policy=self.remat_policy,
        )


@dataclass(frozen=True)
class TextConfig:
    """MPNet text encoder config (HF MPNetConfig subset; ref radzero.yaml:21-27)."""

    model_type: str = "mpnet"
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    vocab_size: int = 30527
    max_position_embeddings: int = 514
    relative_attention_num_buckets: int = 32
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 1
    use_cls_token: bool = False       # False -> masked mean pooling (ref radzero.yaml:27)
    use_text_projection: bool = False # optional Linear(text_dim -> 2*hidden) (modeling.py:69-72)
    # Pack the per-layer q/k/v projections into one (D, 3D) GEMM at
    # trace time (params stay in the reference q/k/v layout, so
    # checkpoints/converters are unaffected). Default off: measured
    # SLOWER on-chip at the reference's training shapes (fwd+bwd at
    # S=512: -7.6% at L64, -4.5% at L32) — params are jit INPUTS, so
    # the weight concat is real per-step HBM traffic and the backward
    # adds a matching gradient split; three D x D GEMMs at batch 512*L
    # already fill the MXU. Kept as an opt-in for inference-only text
    # encoding where XLA can constant-fold the concat.
    pack_qkv: bool = False
    # xla | flash (bias-capable Pallas kernel, ops/flash_attention.py).
    # Default xla: at the reference's text shapes (L <= 64) the flash
    # path measured SLOWER on-chip (79.8 vs 97.6 samples/s train step at
    # L64, 92.0 vs 118.8 at L32) — lane padding 64->128 quadruples the
    # score-GEMM work and per-(batch, head) programs underfill the MXU,
    # while XLA batches the whole (S, H, L, L) computation into large
    # GEMMs. Flip to "flash" for long-text configs (L >= 128) where the
    # (S, H, L, L) HBM traffic dominates instead.
    attn_impl: str = "xla"
    # Fuse the post-attention chain (o-proj + add + LN + MLP + add + LN)
    # into one differentiable Pallas kernel pair
    # (ops/fused_layer.py:fused_mpnet_post_vjp): the (S*L, 4D) GELU
    # intermediates and both LN activations never touch HBM in either
    # pass, and the backward recomputes them blockwise in VMEM. Unlike
    # pack_qkv/flash this moves no weights and changes no layouts.
    # Measured full train step (tools/bench_train.py, batch 64, bf16 +
    # remat): WINS at the bucketed L32 recipe real MIMIC sentences land
    # in (149-151 vs 145.9 samples/s) and loses ~1.5% at the worst-case
    # full L64 slot (114.5 vs 116.4); default on because the flagship
    # preset buckets to [16, 32].
    fuse_post: bool = True
    # None -> follow the caller's global remat flag; True/False forces
    # rematerialisation for the text-tower layers only (per-module remat
    # granularity, mirrors AlignConfig.remat). With ``fuse_post`` the
    # per-layer autodiff residuals are just (x, attn_out) + the xla
    # attention internals — small enough that skipping the text forward
    # recompute can pay once the frozen-tower cache (or small batches)
    # free the HBM the global-remat recipe was protecting.
    remat: Optional[bool] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclass(frozen=True)
class LossConfig:
    """RadZeroLoss hyper-parameters (ref losses.py:35-69, radzero.yaml:39-46)."""

    hidden_dim: int = 768
    use_vision_cls_token: bool = True
    attn_temperature: Optional[float] = None  # None -> share loss_temperature
    loss_temperature: float = 0.07            # parameterised as log-temp
    text_features_l2_norm: bool = False
    mpnce_row_sum: bool = False
    mpnce_col_sum: bool = False
    sim_op: str = "cos"                       # cos | dot (radzero.yaml:46)
    use_layer_norm: bool = True               # shared modality LN (losses.py:51)
    train_impl: str = "fused"                 # fused (Pallas custom-VJP kernel,
                                              # cos only) | xla (jnp autodiff)


@dataclass(frozen=True)
class RadZeroConfig:
    """Composite model config (ref CxrAlignConfig, configuration.py:107-129)."""

    vision: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    text: TextConfig = dataclasses.field(default_factory=TextConfig)
    align: AlignConfig = dataclasses.field(default_factory=AlignConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    compute_logits_type: str = "radzero"  # radzero | cls_alignment | global_alignment


def _filter_kwargs(cls, d: dict) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


def with_fused_towers(cfg: RadZeroConfig) -> RadZeroConfig:
    """Flip the vision/align ``attn_impl`` to the forward-only
    Pallas-fused serving layers (ops/fused_layer.py) where supported.

    The single guard point for every inference surface (scorer, serving
    engine, AOT export): only tower configs that actually expose an
    ``attn_impl`` field participate — the fused kernels implement the
    DINOv2 layer body, so SAM/CLIP/MAE alternates keep their XLA path
    untouched instead of crashing ``dataclasses.replace``. On backends
    with no Pallas lowering (e.g. gpu) the config is returned unchanged:
    the kernels run natively on TPU and interpreted on CPU only."""
    import jax

    if jax.default_backend() not in ("cpu", "tpu"):
        return cfg
    changes = {}
    for name in ("vision", "align"):
        sub = getattr(cfg, name, None)
        if sub is not None and any(
            f.name == "attn_impl" for f in dataclasses.fields(sub)
        ):
            changes[name] = dataclasses.replace(sub, attn_impl="fused")
    return dataclasses.replace(cfg, **changes) if changes else cfg


def resolve_backend_impls(cfg: RadZeroConfig) -> RadZeroConfig:
    """Downgrade Pallas-only impl choices to their XLA equivalents on
    backends without a Pallas/Mosaic lowering (anything but tpu/cpu —
    the kernels run natively on TPU and interpreted on CPU).

    The dataclass DEFAULTS pick the fast TPU path (vision 'flash',
    align 'fused_vjp', text ``fuse_post``, loss 'fused'); on e.g. a GPU
    backend those would crash at the first pallas_call. Every runtime
    surface (trainer, scorer, serving engine, export) routes its config
    through here so a default config runs everywhere — at XLA speed on
    non-TPU backends, with a logged warning."""
    import jax

    if jax.default_backend() in ("cpu", "tpu"):
        return cfg
    changes = {}
    for name in ("vision", "align"):
        sub = getattr(cfg, name, None)
        if (
            sub is not None
            and any(f.name == "attn_impl" for f in dataclasses.fields(sub))
            and sub.attn_impl != "xla"
        ):
            changes[name] = dataclasses.replace(sub, attn_impl="xla")
    text_changes = {}
    if cfg.text.attn_impl != "xla":
        text_changes["attn_impl"] = "xla"
    if cfg.text.fuse_post:
        text_changes["fuse_post"] = False
    if text_changes:
        changes["text"] = dataclasses.replace(cfg.text, **text_changes)
    if cfg.loss.train_impl == "fused":
        changes["loss"] = dataclasses.replace(cfg.loss, train_impl="xla")
    if not changes:
        return cfg
    import logging

    logging.getLogger("radzero").warning(
        "backend %r has no Pallas lowering: downgraded %s to XLA impls",
        jax.default_backend(), sorted(changes),
    )
    return dataclasses.replace(cfg, **changes)


def _vision_config_from_dict(vc: dict):
    """Dispatch the vision block on ``model_type`` — the YAML equivalent
    of the reference's config-side model_type branching
    (exp/cxr_pt/model/configuration.py:15-40). dinov2/raddino get the
    flagship ViTConfig; clip/siglip/xrayclip/biomedclip, m3ae and sam
    get their tower-specific config classes (the reference ACCEPTS
    "sam" here but its encoder factory then crashes; ours builds it)."""
    mt = vc.get("model_type", "dinov2")
    if mt in ("dinov2", "raddino"):
        vc.setdefault("img_size", 518)
        return ViTConfig(**_filter_kwargs(ViTConfig, vc))
    if mt == "sam":
        from radzero_tpu.models.sam_vit import SamViTConfig

        if "global_attn_indexes" in vc:
            vc["global_attn_indexes"] = tuple(vc["global_attn_indexes"])
        return SamViTConfig(**_filter_kwargs(SamViTConfig, vc))
    if mt in ("m3ae", "mae"):
        from radzero_tpu.models.mae_vit import MAEViTConfig

        return MAEViTConfig(**_filter_kwargs(MAEViTConfig, vc))
    if mt in ("clip", "clip_vision_model", "xrayclip", "biomedclip",
              "siglip", "siglip_vision_model"):
        from radzero_tpu.models.clip_vit import ClipViTConfig

        return ClipViTConfig(**_filter_kwargs(ClipViTConfig, vc))
    raise NotImplementedError(f"vision model_type {mt!r}")


def radzero_config_from_dict(model_config: dict) -> RadZeroConfig:
    """Build a RadZeroConfig from the YAML ``model.model_config`` block."""
    vision = _vision_config_from_dict(dict(model_config.get("vision_config", {})))

    tc = dict(model_config.get("text_config", {}))
    text = TextConfig(**_filter_kwargs(TextConfig, tc))

    ac = dict(model_config.get("align_transformer_config", {}))
    align = AlignConfig(**_filter_kwargs(AlignConfig, ac))

    loss_block = model_config.get("loss", {}) or {}
    lc = dict(loss_block.get("RadZeroLoss", {}) or {})
    loss = LossConfig(**_filter_kwargs(LossConfig, lc))

    return RadZeroConfig(
        vision=vision,
        text=text,
        align=align,
        loss=loss,
        compute_logits_type=model_config.get("compute_logits_type", "radzero"),
    )
