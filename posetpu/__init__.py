"""posetpu — TPU-native adversarial-augmentation pose estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``zhiqiangdon/pose-adv-aug`` (CVPR 2018, arXiv:1805.09707): stacked-hourglass
human pose estimation jointly trained with an adversarial augmentation agent
that predicts hard scale/rotation bins per sample.

Unlike the reference (host-side PIL/numpy augmentation feeding a PyTorch GPU
model), every hot-path op here runs on device inside one jitted program:

- batched inverse-affine bilinear warp (XLA gather / Pallas kernel)
- Gaussian target-heatmap rasterization, vectorized over (batch, joint, H, W)
- hourglass forward/backward on the MXU in bfloat16
- agent sampling + REINFORCE-style reward, no host round-trips
- ``shard_map`` data parallelism over a device mesh with ``psum`` gradients

Layout (maps to SURVEY.md §7):
    posetpu.oracles   — numpy re-implementations of the reference numerics
                        (bearpaw-lineage transforms/imutils/evaluation); the
                        fp-parity contract for everything below. Test-only.
    posetpu.aug       — device-side augmentation ops (affine params, warp,
                        heatmap rasterizer, color, AHO occlusion)
    posetpu.models    — hourglass (flax linen), ASR agent, AHO agent head
    posetpu.data      — MPII/LSP annotation ingestion (reference JSON schema),
                        synthetic mini-split, host loader (decode only)
    posetpu.train     — jitted train/eval steps, joint minimax step, epoch loop
    posetpu.parallel  — mesh construction, shard_map DP wrappers
    posetpu.eval      — heatmap decode (argmax + quarter offset), PCK/PCKh,
                        preds export
    posetpu.ckpt      — orbax checkpointing + torch-layout export for parity
    posetpu.configs   — dataclass experiment configs with argparse overrides
    posetpu.utils     — txt logger (reference column format), meters

Reference provenance: /root/reference was empty at survey time (SURVEY.md §0);
all reference citations in docstrings are to the reconstructed component
inventory in SURVEY.md §2 (C1..C15) and the bearpaw/pytorch-pose lineage the
reference follows.
"""

__version__ = "0.1.0"
