"""pointnet12_tpu — a TPU-native point-cloud deep-learning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the PyTorch
reference ``Jiang-Muyun/PointNet12`` (PointNet + PointNet++ for point-cloud
classification and semantic segmentation), designed TPU-first:

* point ops (FPS, ball query, 3-NN interpolation) as fused XLA programs and
  Pallas kernels that keep working sets in VMEM,
* shared per-point MLPs lowered to MXU batched matmuls with fused BN+ReLU,
* one jitted cloud→logits→grads program per step (no host roundtrips),
* data parallelism via ``jax.sharding`` named meshes (ICI collectives).

Layer map (mirrors SURVEY.md §1):
  ops/      L1 point-cloud ops (jnp reference implementations)
  kernels/  L1 Pallas TPU kernels (fast path)
  nn/       L2 neural modules (shared MLP, T-Net, SA, FP)
  models/   L3 the five model configs
  train/    L4 jitted train/eval steps, losses, metrics, checkpointing
  data/     L0 fixed-shape dataset feeders + augmentations
  parallel/ device-mesh / sharding utilities
  cli/      L5 reference-compatible command-line entry points
"""

__version__ = "0.1.0"

from pointnet12_tpu import ops, nn, models  # noqa: F401
