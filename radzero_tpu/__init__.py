"""radzero_tpu — a TPU-native chest X-ray vision-language alignment framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of RadZero
(NeurIPS 2025, arXiv:2504.07416; reference layout documented in SURVEY.md):

- ``models``   : DINOv2-style ViT vision tower, MPNet text tower, align
                 transformer, and the composite ``RadZeroModel``
                 (reference: exp/cxr_pt/model/*).
- ``ops``      : TPU compute primitives — torch-parity resizing, attention
                 (with Pallas flash-attention), fused VL-CABS.
- ``losses``   : multi-positive NCE and the RadZero contrastive loss
                 (reference: exp/cxr_pt/model/losses.py).
- ``parallel`` : jax.sharding mesh plumbing; global-batch contrastive
                 gathers become sharding annotations + XLA collectives.
- ``data``     : host-side image/text processing and the MIMIC-CXR
                 training pipeline (reference: exp/cxr_pt/dataset.py,
                 model/processing.py).
- ``train``    : explicit pjit train loop with multi-loss telemetry,
                 checkpointing and early stopping (replaces the 1855-line
                 HF-Trainer fork in common/trainer.py).
- ``eval``     : zero-shot classification / grounding / segmentation
                 harness + metrics (reference: exp/cxr_pt/inference/*,
                 external/CARZero metric mergers).
- ``viz``      : similarity-map overlay rendering
                 (reference: exp/cxr_pt/inference/visualization/*).
- ``preprocess``: MIMIC-CXR report → finding-sentence pipeline
                 (reference: preprocess/*).

The compute path is pure JAX (no torch). Torch is used only inside the
offline checkpoint converter (``tools/convert_checkpoint.py``) and the
parity test-suite, where it serves as the numerical oracle.
"""

__version__ = "0.1.0"
