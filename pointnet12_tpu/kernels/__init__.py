"""Pallas TPU kernels — the fast path for the L1 point ops.

Where the reference runs ``npoint`` sequential CUDA launches for FPS and
materializes/sorts a ``(B, S, N)`` matrix for ball query (SURVEY.md §3.2),
these kernels keep the per-cloud working set (coordinates, running-min
distance array, distance tiles) resident in VMEM and do the selection
on-chip. Dispatch is controlled by :mod:`pointnet12_tpu.kernels.dispatch`.
"""
