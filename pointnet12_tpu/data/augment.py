"""Point-cloud augmentations (host-side numpy, reference parameter set).

Reference behavior (SURVEY.md §2 "Augmentations", provider.py lineage):
rotation about the up axis, small-angle perturbation, Gaussian jitter
(sigma=0.01, clip 0.05), random scale (0.8-1.25), shift (+-0.1), and random
point dropout that replaces dropped points with the first point. All apply
to the xyz channels only and run on the host feeder thread, exactly like the
reference's numpy pipeline — shapes stay fixed so the device program never
recompiles.
"""

from typing import Optional

import numpy as np


def pc_normalize(pc: np.ndarray) -> np.ndarray:
    """Center to the centroid and scale into the unit sphere."""
    centroid = pc.mean(axis=0)
    pc = pc - centroid
    scale = np.max(np.sqrt(np.sum(pc**2, axis=1)))
    return pc / max(scale, 1e-12)


def rotate_point_cloud(
    batch: np.ndarray, rng: Optional[np.random.RandomState] = None
) -> np.ndarray:
    """Random rotation about the up (y) axis. batch: (B, N, >=3)."""
    rng = rng or np.random
    out = batch.copy()
    for b in range(batch.shape[0]):
        angle = rng.uniform() * 2 * np.pi
        c, s = np.cos(angle), np.sin(angle)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=batch.dtype)
        out[b, :, :3] = batch[b, :, :3] @ rot
    return out


def rotate_point_cloud_z(
    batch: np.ndarray, rng: Optional[np.random.RandomState] = None
) -> np.ndarray:
    """Random rotation about z (up axis for scans/scenes)."""
    rng = rng or np.random
    out = batch.copy()
    for b in range(batch.shape[0]):
        angle = rng.uniform() * 2 * np.pi
        c, s = np.cos(angle), np.sin(angle)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=batch.dtype)
        out[b, :, :3] = batch[b, :, :3] @ rot
    return out


def rotate_perturbation_point_cloud(
    batch: np.ndarray,
    angle_sigma: float = 0.06,
    angle_clip: float = 0.18,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    """Small random rotations about all three axes."""
    rng = rng or np.random
    out = batch.copy()
    for b in range(batch.shape[0]):
        a = np.clip(angle_sigma * rng.randn(3), -angle_clip, angle_clip)
        cx, sx = np.cos(a[0]), np.sin(a[0])
        cy, sy = np.cos(a[1]), np.sin(a[1])
        cz, sz = np.cos(a[2]), np.sin(a[2])
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        rot = (rz @ ry @ rx).astype(batch.dtype)
        out[b, :, :3] = batch[b, :, :3] @ rot
    return out


def jitter_point_cloud(
    batch: np.ndarray,
    sigma: float = 0.01,
    clip: float = 0.05,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    rng = rng or np.random
    noise = np.clip(
        sigma * rng.randn(*batch[..., :3].shape), -clip, clip
    ).astype(batch.dtype)
    out = batch.copy()
    out[..., :3] += noise
    return out


def random_scale_point_cloud(
    batch: np.ndarray,
    scale_low: float = 0.8,
    scale_high: float = 1.25,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    rng = rng or np.random
    scales = rng.uniform(scale_low, scale_high, batch.shape[0])
    out = batch.copy()
    out[..., :3] *= scales[:, None, None].astype(batch.dtype)
    return out


def shift_point_cloud(
    batch: np.ndarray,
    shift_range: float = 0.1,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    rng = rng or np.random
    shifts = rng.uniform(-shift_range, shift_range, (batch.shape[0], 3))
    out = batch.copy()
    out[..., :3] += shifts[:, None, :].astype(batch.dtype)
    return out


def random_point_dropout(
    batch: np.ndarray,
    max_dropout_ratio: float = 0.875,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    """Replace a random fraction of points with the first point (keeps shape)."""
    rng = rng or np.random
    out = batch.copy()
    for b in range(batch.shape[0]):
        ratio = rng.uniform() * max_dropout_ratio
        drop = np.where(rng.uniform(size=batch.shape[1]) <= ratio)[0]
        if len(drop) > 0:
            out[b, drop, :] = out[b, 0, :]
    return out


def classification_augment(
    batch: np.ndarray, rng: Optional[np.random.RandomState] = None
) -> np.ndarray:
    """The reference train_clf.py recipe: rotate + jitter (+ dropout/scale/shift)."""
    batch = random_point_dropout(batch, rng=rng)
    batch = random_scale_point_cloud(batch, rng=rng)
    batch = shift_point_cloud(batch, rng=rng)
    batch = rotate_point_cloud(batch, rng=rng)
    batch = jitter_point_cloud(batch, rng=rng)
    return batch


def segmentation_augment(
    batch: np.ndarray, rng: Optional[np.random.RandomState] = None
) -> np.ndarray:
    """Scene-level recipe: z-rotation + jitter (labels untouched)."""
    batch = rotate_point_cloud_z(batch, rng=rng)
    batch = jitter_point_cloud(batch, rng=rng)
    return batch
