"""crvqa_tpu — a TPU-native JAX framework for compressing and debiasing VQA models.

Re-implements the capabilities of PhoebusSi/Compress-Robust-VQA (EMNLP 2023,
arXiv 2210.14558) as an idiomatic JAX/XLA/Pallas framework:

- Stage 1: full fine-tuning of LXMERT / VisualBERT on VQA-CP v2 / VQA-VS with
  the debias-loss zoo (BCE / LMH / LPF / RUBI / BiasProduct / Reweight).
- Stage 2: differentiable mask training — frozen weights, trainable
  real-valued mask scores binarized through straight-through estimators,
  per-modality (Lang/Vis/Fus/P) target sparsities enforced by on-device
  kth-value threshold resets.
- Stage 3: permanent pruning of the learned subnetwork + further fine-tuning.

Unlike the reference (PyTorch module surgery via `Masker.patch_modules`),
masks here live in a pytree parallel to the frozen parameter pytree and are
applied functionally inside the jitted train step; data parallelism and
mask-statistics reductions ride XLA collectives over a `jax.sharding.Mesh`.
"""

__version__ = "0.3.0"
