"""Torch-CPU oracle models, written from SURVEY.md §2 behavioral specs.

PointNet classification/segmentation (STN3d/STNkd/encoder/heads) and
PointNet++ (SA/FP modules + the five configs' hyperparameters), with the
lineage's structure: 1x1 convs + BN + ReLU, global max-pool, log_softmax.
Inputs are channels-FIRST ``(B, C, N)`` as in the reference; the JAX side is
channels-last — the parity tests transpose at the boundary.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_ref.ops_torch import (
    farthest_point_sample,
    index_points,
    query_ball_point,
    square_distance,
)

# Execute the SA/FP conv stacks channels-last via matmul + functional BN
# instead of permute + Conv2d/Conv1d + BatchNorm2d/1d. Same modules, same
# parameters, same statistics semantics (F.batch_norm normalizes with the
# biased batch variance and EMA-updates running_var with the unbiased
# estimate, exactly as nn.BatchNorm does) — only the fp32 accumulation
# order differs (roundoff-level; the quality probes are statistical at
# plateau). Measured ~1.9x on the 1-core oracle box, where the multi-seed
# quality_parity runs are CPU-bound (VERDICT r4 item 1). Equivalence is
# pinned by tests/test_torch_ref_fast.py; set False to get the naive
# reference execution path.
FAST_MLP = True


class _FastReLU(torch.autograd.Function):
    """ReLU with a mask-multiply backward: torch's threshold_backward is
    ~1.4x slower than grad*(x>0) on the big single-core tensors here.
    Values and gradient (zero at x==0) identical to F.relu."""

    @staticmethod
    def forward(ctx, inp):
        ctx.save_for_backward(inp > 0)
        return torch.clamp_min(inp, 0)

    @staticmethod
    def backward(ctx, grad_out):
        (mask,) = ctx.saved_tensors
        return grad_out * mask


def _mlp_channels_last(x, convs, bns, training):
    """(B, *, C) -> (B, *, C') through a Conv(1x1)+BN+ReLU stack."""
    shape = x.shape
    x = x.reshape(-1, shape[-1])
    for conv, bn in zip(convs, bns):
        # F.linear == addmm (fused bias) — measured faster than mm + add
        x = F.linear(x, conv.weight.view(conv.out_channels, -1), conv.bias)
        x = F.batch_norm(
            x, bn.running_mean, bn.running_var, bn.weight, bn.bias,
            training, bn.momentum, bn.eps,
        )
        x = _FastReLU.apply(x)
        if training and bn.track_running_stats:
            bn.num_batches_tracked += 1
    return x.view(*shape[:-1], x.shape[-1])


class STNkd(nn.Module):
    def __init__(self, k=3):
        super().__init__()
        self.k = k
        self.conv1 = nn.Conv1d(k, 64, 1)
        self.conv2 = nn.Conv1d(64, 128, 1)
        self.conv3 = nn.Conv1d(128, 1024, 1)
        self.fc1 = nn.Linear(1024, 512)
        self.fc2 = nn.Linear(512, 256)
        self.fc3 = nn.Linear(256, k * k)
        self.bn1 = nn.BatchNorm1d(64)
        self.bn2 = nn.BatchNorm1d(128)
        self.bn3 = nn.BatchNorm1d(1024)
        self.bn4 = nn.BatchNorm1d(512)
        self.bn5 = nn.BatchNorm1d(256)
        nn.init.zeros_(self.fc3.weight)
        nn.init.zeros_(self.fc3.bias)

    def forward(self, x):
        B = x.size(0)
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = torch.max(x, 2)[0]
        x = F.relu(self.bn4(self.fc1(x)))
        x = F.relu(self.bn5(self.fc2(x)))
        x = self.fc3(x)
        iden = torch.eye(self.k).flatten().repeat(B, 1)
        return (x + iden).view(-1, self.k, self.k)


class PointNetEncoder(nn.Module):
    def __init__(self, global_feat=True, feature_transform=False, channel=3):
        super().__init__()
        self.stn = STNkd(k=3)
        self.conv1 = nn.Conv1d(channel, 64, 1)
        self.conv2 = nn.Conv1d(64, 128, 1)
        self.conv3 = nn.Conv1d(128, 1024, 1)
        self.bn1 = nn.BatchNorm1d(64)
        self.bn2 = nn.BatchNorm1d(128)
        self.bn3 = nn.BatchNorm1d(1024)
        self.global_feat = global_feat
        self.feature_transform = feature_transform
        if feature_transform:
            self.fstn = STNkd(k=64)

    def forward(self, x):
        B, D, N = x.size()
        trans = self.stn(x[:, :3])
        xyz = torch.bmm(trans.transpose(2, 1), x[:, :3])  # rotate coords
        # NOTE: our jax encoder computes xyz @ trans on (N, 3); with x (3, N)
        # the equivalent is trans^T @ x.
        x = torch.cat([xyz, x[:, 3:]], dim=1) if D > 3 else xyz
        x = F.relu(self.bn1(self.conv1(x)))
        trans_feat = None
        if self.feature_transform:
            trans_feat = self.fstn(x)
            x = torch.bmm(trans_feat.transpose(2, 1), x)
        pointfeat = x
        x = F.relu(self.bn2(self.conv2(x)))
        x = self.bn3(self.conv3(x))
        x = torch.max(x, 2)[0]
        if self.global_feat:
            return x, trans, trans_feat
        x = x.view(-1, 1024, 1).repeat(1, 1, N)
        return torch.cat([x, pointfeat], 1), trans, trans_feat


class PointNetCls(nn.Module):
    def __init__(self, num_classes=40, feature_transform=False, channel=3):
        super().__init__()
        self.feat = PointNetEncoder(True, feature_transform, channel)
        self.fc1 = nn.Linear(1024, 512)
        self.fc2 = nn.Linear(512, 256)
        self.fc3 = nn.Linear(256, num_classes)
        self.bn1 = nn.BatchNorm1d(512)
        self.bn2 = nn.BatchNorm1d(256)
        self.dropout = nn.Dropout(p=0.4)

    def forward(self, x):
        x, trans, trans_feat = self.feat(x)
        x = F.relu(self.bn1(self.fc1(x)))
        x = F.relu(self.bn2(self.dropout(self.fc2(x))))
        x = self.fc3(x)
        return F.log_softmax(x, dim=1), trans_feat


class PointNetSeg(nn.Module):
    def __init__(self, num_classes=13, feature_transform=False, channel=3):
        super().__init__()
        self.feat = PointNetEncoder(False, feature_transform, channel)
        self.conv1 = nn.Conv1d(1088, 512, 1)
        self.conv2 = nn.Conv1d(512, 256, 1)
        self.conv3 = nn.Conv1d(256, 128, 1)
        self.conv4 = nn.Conv1d(128, num_classes, 1)
        self.bn1 = nn.BatchNorm1d(512)
        self.bn2 = nn.BatchNorm1d(256)
        self.bn3 = nn.BatchNorm1d(128)

    def forward(self, x):
        x, trans, trans_feat = self.feat(x)
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = self.conv4(x)
        return F.log_softmax(x.transpose(2, 1), dim=-1), trans_feat


class SetAbstraction(nn.Module):
    def __init__(self, npoint, radius, nsample, in_channel, mlp, group_all):
        super().__init__()
        self.npoint, self.radius, self.nsample = npoint, radius, nsample
        self.group_all = group_all
        self.mlp_convs = nn.ModuleList()
        self.mlp_bns = nn.ModuleList()
        last = in_channel
        for out in mlp:
            self.mlp_convs.append(nn.Conv2d(last, out, 1))
            self.mlp_bns.append(nn.BatchNorm2d(out))
            last = out

    def forward(self, xyz, points):
        # xyz: (B, N, 3) channels-last here for op reuse
        if self.group_all:
            new_xyz = torch.zeros(xyz.shape[0], 1, 3)
            grouped = xyz.unsqueeze(1)  # (B, 1, N, 3)
            if points is not None:
                grouped = torch.cat([grouped, points.unsqueeze(1)], dim=-1)
        else:
            fps_idx = farthest_point_sample(xyz, self.npoint)
            new_xyz = index_points(xyz, fps_idx)
            idx = query_ball_point(self.radius, self.nsample, xyz, new_xyz)
            grouped = index_points(xyz, idx) - new_xyz.unsqueeze(2)
            if points is not None:
                grouped = torch.cat(
                    [grouped, index_points(points, idx)], dim=-1
                )
        if FAST_MLP:
            x = _mlp_channels_last(
                grouped, self.mlp_convs, self.mlp_bns, self.training
            )
            return new_xyz, torch.max(x, 2)[0]  # (B, S, C')
        x = grouped.permute(0, 3, 2, 1)  # (B, C, K, S)
        for conv, bn in zip(self.mlp_convs, self.mlp_bns):
            x = F.relu(bn(conv(x)))
        x = torch.max(x, 2)[0]  # (B, C', S)
        return new_xyz, x.permute(0, 2, 1)  # channels-last out


class FeaturePropagation(nn.Module):
    def __init__(self, in_channel, mlp):
        super().__init__()
        self.mlp_convs = nn.ModuleList()
        self.mlp_bns = nn.ModuleList()
        last = in_channel
        for out in mlp:
            self.mlp_convs.append(nn.Conv1d(last, out, 1))
            self.mlp_bns.append(nn.BatchNorm1d(out))
            last = out

    def forward(self, xyz1, xyz2, points1, points2):
        # all channels-last
        B, N, _ = xyz1.shape
        S = xyz2.shape[1]
        if S == 1:
            interp = points2.repeat(1, N, 1)
        else:
            dists = square_distance(xyz1, xyz2)
            dists, idx = dists.sort(dim=-1)
            dists, idx = dists[:, :, :3], idx[:, :, :3]
            w = 1.0 / (dists + 1e-8)
            w = w / torch.sum(w, dim=2, keepdim=True)
            interp = torch.sum(
                index_points(points2, idx) * w.unsqueeze(-1), dim=2
            )
        x = torch.cat([points1, interp], dim=-1) if points1 is not None else interp
        if FAST_MLP:
            return _mlp_channels_last(
                x, self.mlp_convs, self.mlp_bns, self.training
            )
        x = x.permute(0, 2, 1)
        for conv, bn in zip(self.mlp_convs, self.mlp_bns):
            x = F.relu(bn(conv(x)))
        return x.permute(0, 2, 1)


class SetAbstractionMsg(nn.Module):
    def __init__(self, npoint, radius_list, nsample_list, in_channel, mlp_list):
        super().__init__()
        self.npoint = npoint
        self.radius_list = radius_list
        self.nsample_list = nsample_list
        self.conv_blocks = nn.ModuleList()
        self.bn_blocks = nn.ModuleList()
        for mlp in mlp_list:
            convs, bns = nn.ModuleList(), nn.ModuleList()
            last = in_channel + 3
            for out in mlp:
                convs.append(nn.Conv2d(last, out, 1))
                bns.append(nn.BatchNorm2d(out))
                last = out
            self.conv_blocks.append(convs)
            self.bn_blocks.append(bns)

    def forward(self, xyz, points):
        fps_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = index_points(xyz, fps_idx)
        outs = []
        for i, (radius, nsample) in enumerate(
            zip(self.radius_list, self.nsample_list)
        ):
            idx = query_ball_point(radius, nsample, xyz, new_xyz)
            grouped = index_points(xyz, idx) - new_xyz.unsqueeze(2)
            if points is not None:
                grouped = torch.cat([grouped, index_points(points, idx)], -1)
            if FAST_MLP:
                x = _mlp_channels_last(
                    grouped, self.conv_blocks[i], self.bn_blocks[i],
                    self.training,
                )
                outs.append(torch.max(x, 2)[0].permute(0, 2, 1))
            else:
                x = grouped.permute(0, 3, 2, 1)
                for conv, bn in zip(self.conv_blocks[i], self.bn_blocks[i]):
                    x = F.relu(bn(conv(x)))
                outs.append(torch.max(x, 2)[0])
        return new_xyz, torch.cat(outs, dim=1).permute(0, 2, 1)


class _Pn2ClsHead(nn.Module):
    def __init__(self, num_classes):
        super().__init__()
        self.fc1 = nn.Linear(1024, 512)
        self.bn1 = nn.BatchNorm1d(512)
        self.drop1 = nn.Dropout(0.4)
        self.fc2 = nn.Linear(512, 256)
        self.bn2 = nn.BatchNorm1d(256)
        self.drop2 = nn.Dropout(0.4)
        self.fc3 = nn.Linear(256, num_classes)

    def forward(self, x):
        x = self.drop1(F.relu(self.bn1(self.fc1(x))))
        x = self.drop2(F.relu(self.bn2(self.fc2(x))))
        return F.log_softmax(self.fc3(x), -1)


class PointNet2ClsSsg(nn.Module):
    def __init__(self, num_classes=40):
        super().__init__()
        self.sa1 = SetAbstraction(512, 0.2, 32, 3, [64, 64, 128], False)
        self.sa2 = SetAbstraction(128, 0.4, 64, 128 + 3, [128, 128, 256], False)
        self.sa3 = SetAbstraction(None, None, None, 256 + 3, [256, 512, 1024], True)
        self.head = _Pn2ClsHead(num_classes)

    def forward(self, points):
        xyz = points[..., :3]
        l1_xyz, l1 = self.sa1(xyz, None)
        l2_xyz, l2 = self.sa2(l1_xyz, l1)
        _, l3 = self.sa3(l2_xyz, l2)
        return self.head(l3[:, 0]), None


class PointNet2ClsMsg(nn.Module):
    def __init__(self, num_classes=40):
        super().__init__()
        self.sa1 = SetAbstractionMsg(
            512, [0.1, 0.2, 0.4], [16, 32, 128], 0,
            [[32, 32, 64], [64, 64, 128], [64, 96, 128]],
        )
        self.sa2 = SetAbstractionMsg(
            128, [0.2, 0.4, 0.8], [32, 64, 128], 320,
            [[64, 64, 128], [128, 128, 256], [128, 128, 256]],
        )
        self.sa3 = SetAbstraction(None, None, None, 640 + 3, [256, 512, 1024], True)
        self.head = _Pn2ClsHead(num_classes)

    def forward(self, points):
        xyz = points[..., :3]
        l1_xyz, l1 = self.sa1(xyz, None)
        l2_xyz, l2 = self.sa2(l1_xyz, l1)
        _, l3 = self.sa3(l2_xyz, l2)
        return self.head(l3[:, 0]), None


class PointNet2SemSeg(nn.Module):
    def __init__(self, num_classes=13, channel=9):
        super().__init__()
        self.sa1 = SetAbstraction(1024, 0.1, 32, channel + 3, [32, 32, 64], False)
        self.sa2 = SetAbstraction(256, 0.2, 32, 64 + 3, [64, 64, 128], False)
        self.sa3 = SetAbstraction(64, 0.4, 32, 128 + 3, [128, 128, 256], False)
        self.sa4 = SetAbstraction(16, 0.8, 32, 256 + 3, [256, 256, 512], False)
        self.fp4 = FeaturePropagation(768, [256, 256])
        self.fp3 = FeaturePropagation(384, [256, 256])
        self.fp2 = FeaturePropagation(320, [256, 128])
        self.fp1 = FeaturePropagation(128, [128, 128, 128])
        self.conv1 = nn.Conv1d(128, 128, 1)
        self.bn1 = nn.BatchNorm1d(128)
        self.drop1 = nn.Dropout(0.5)
        self.conv2 = nn.Conv1d(128, num_classes, 1)

    def forward(self, points):
        # points: (B, N, C) channels-last
        l0_xyz = points[..., :3]
        l0_points = points
        l1_xyz, l1 = self.sa1(l0_xyz, l0_points)
        l2_xyz, l2 = self.sa2(l1_xyz, l1)
        l3_xyz, l3 = self.sa3(l2_xyz, l2)
        l4_xyz, l4 = self.sa4(l3_xyz, l3)
        l3 = self.fp4(l3_xyz, l4_xyz, l3, l4)
        l2 = self.fp3(l2_xyz, l3_xyz, l2, l3)
        l1 = self.fp2(l1_xyz, l2_xyz, l1, l2)
        l0 = self.fp1(l0_xyz, l1_xyz, None, l1)
        x = l0.permute(0, 2, 1)
        x = self.drop1(F.relu(self.bn1(self.conv1(x))))
        x = self.conv2(x)
        return F.log_softmax(x.transpose(2, 1), dim=-1), None
