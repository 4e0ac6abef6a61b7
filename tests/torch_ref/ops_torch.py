"""Torch-CPU oracles for the L1 point ops (spec: SURVEY.md §2).

Implements the reference semantics exactly as surveyed:
  * square_distance via the ||s||^2 + ||d||^2 - 2 s.d expansion,
  * FPS with a running-min distance array initialized to 1e10 and
    first-index argmax tie-breaking (torch CPU),
  * ball query via mask-to-N, sort-by-index, first-K, pad-with-first,
  * 3-NN interpolation with 1/(d + 1e-8) inverse-distance weights.
"""

import torch


def square_distance(src: torch.Tensor, dst: torch.Tensor) -> torch.Tensor:
    B, N, _ = src.shape
    M = dst.shape[1]
    dist = -2 * torch.matmul(src, dst.permute(0, 2, 1))
    dist += torch.sum(src**2, -1).view(B, N, 1)
    dist += torch.sum(dst**2, -1).view(B, 1, M)
    return dist


def index_points(points: torch.Tensor, idx: torch.Tensor) -> torch.Tensor:
    B = points.shape[0]
    view_shape = [B] + [1] * (idx.dim() - 1)
    repeat_shape = [1] + list(idx.shape[1:])
    batch_indices = (
        torch.arange(B, dtype=torch.long)
        .view(view_shape)
        .repeat(repeat_shape)
    )
    return points[batch_indices, idx, :]


def farthest_point_sample(
    xyz: torch.Tensor, npoint: int, start: int = 0
) -> torch.Tensor:
    B, N, _ = xyz.shape
    centroids = torch.zeros(B, npoint, dtype=torch.long)
    distance = torch.ones(B, N) * 1e10
    farthest = torch.full((B,), start, dtype=torch.long)
    batch_indices = torch.arange(B, dtype=torch.long)
    for i in range(npoint):
        centroids[:, i] = farthest
        centroid = xyz[batch_indices, farthest, :].view(B, 1, 3)
        dist = torch.sum((xyz - centroid) ** 2, -1)
        mask = dist < distance
        distance[mask] = dist[mask]
        farthest = torch.max(distance, -1)[1]
    return centroids


def query_ball_point(
    radius: float,
    nsample: int,
    xyz: torch.Tensor,
    new_xyz: torch.Tensor,
) -> torch.Tensor:
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    group_idx = (
        torch.arange(N, dtype=torch.long).view(1, 1, N).repeat(B, S, 1)
    )
    sqrdists = square_distance(new_xyz, xyz)
    group_idx[sqrdists > radius**2] = N
    group_idx = group_idx.sort(dim=-1)[0][:, :, :nsample]
    group_first = group_idx[:, :, 0:1].repeat(1, 1, nsample)
    mask = group_idx == N
    group_idx[mask] = group_first[mask]
    return group_idx


def three_nn_interpolate(
    xyz_fine: torch.Tensor,
    xyz_coarse: torch.Tensor,
    feats_coarse: torch.Tensor,
) -> torch.Tensor:
    dists = square_distance(xyz_fine, xyz_coarse)
    dists, idx = dists.sort(dim=-1)
    dists, idx = dists[:, :, :3], idx[:, :, :3]
    dist_recip = 1.0 / (dists + 1e-8)
    norm = torch.sum(dist_recip, dim=2, keepdim=True)
    weight = dist_recip / norm
    return torch.sum(
        index_points(feats_coarse, idx) * weight.view(*idx.shape, 1), dim=2
    )
