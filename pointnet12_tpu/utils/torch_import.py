"""torch -> flax weight conversion (SURVEY.md §5 checkpoint/resume).

Lets users of the PyTorch reference load their trained ``state_dict``s into
this framework (and powers the logit-parity tests, BASELINE.json:5 "matching
the PyTorch reference's logits within fp32 tolerance").

Layout rules:
  * 1x1 Conv1d/Conv2d weight ``(out, in, 1[, 1])`` -> Dense kernel
    ``(in, out)`` (squeeze + transpose),
  * Linear weight ``(out, in)`` -> kernel ``(in, out)``,
  * BatchNorm weight/bias -> scale/bias (params); running_mean/var ->
    mean/var (batch_stats).

Inputs are plain dicts of numpy arrays (``{k: v.numpy() for k, v in
torch_model.state_dict().items()}``) so the framework itself never imports
torch. Key tables follow the reference lineage naming (STN conv1..3 /
fc1..3 / bn1..5, encoder conv1..3 / bn1..3, SA mlp_convs.N / mlp_bns.N,
FP mlp_convs.N / mlp_bns.N).
"""

from typing import Dict

import numpy as np


def _dense(sd, key):
    w = np.asarray(sd[f"{key}.weight"], np.float32)
    if w.ndim == 4:  # Conv2d 1x1
        w = w[:, :, 0, 0]
    elif w.ndim == 3:  # Conv1d k=1
        w = w[:, :, 0]
    return {"kernel": w.T, "bias": np.asarray(sd[f"{key}.bias"], np.float32)}


def _bn_params(sd, key):
    return {
        "scale": np.asarray(sd[f"{key}.weight"], np.float32),
        "bias": np.asarray(sd[f"{key}.bias"], np.float32),
    }


def _bn_stats(sd, key):
    return {
        "mean": np.asarray(sd[f"{key}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{key}.running_var"], np.float32),
    }


def _shared_mlp(sd, conv_keys, bn_keys):
    """params, stats for a SharedMLP from parallel conv/bn key lists."""
    params, stats = {}, {}
    for i, (ck, bk) in enumerate(zip(conv_keys, bn_keys)):
        params[f"dense_{i}"] = _dense(sd, ck)
        params[f"bn_{i}"] = _bn_params(sd, bk)
        stats[f"bn_{i}"] = _bn_stats(sd, bk)
    return params, stats


def _tnet(sd, prefix):
    mlp_p, mlp_s = _shared_mlp(
        sd,
        [f"{prefix}.conv{i}" for i in (1, 2, 3)],
        [f"{prefix}.bn{i}" for i in (1, 2, 3)],
    )
    params = {
        "mlp": mlp_p,
        "fc_0": _dense(sd, f"{prefix}.fc1"),
        "fc_1": _dense(sd, f"{prefix}.fc2"),
        "fc_bn_0": _bn_params(sd, f"{prefix}.bn4"),
        "fc_bn_1": _bn_params(sd, f"{prefix}.bn5"),
        "fc_out": _dense(sd, f"{prefix}.fc3"),
    }
    stats = {
        "mlp": mlp_s,
        "fc_bn_0": _bn_stats(sd, f"{prefix}.bn4"),
        "fc_bn_1": _bn_stats(sd, f"{prefix}.bn5"),
    }
    return params, stats


def _encoder(sd, prefix="feat", feature_transform=False):
    stn_p, stn_s = _tnet(sd, f"{prefix}.stn")
    params = {"stn": stn_p}
    stats = {"stn": stn_s}
    for i in (1, 2, 3):
        params[f"conv{i}"] = _dense(sd, f"{prefix}.conv{i}")
        params[f"conv{i}_bn"] = _bn_params(sd, f"{prefix}.bn{i}")
        stats[f"conv{i}_bn"] = _bn_stats(sd, f"{prefix}.bn{i}")
    if feature_transform:
        fstn_p, fstn_s = _tnet(sd, f"{prefix}.fstn")
        params["fstn"] = fstn_p
        stats["fstn"] = fstn_s
    return params, stats


def convert_pointnet_cls(sd: Dict, feature_transform: bool = False):
    enc_p, enc_s = _encoder(sd, "feat", feature_transform)
    params = {
        "feat": enc_p,
        "fc1": _dense(sd, "fc1"),
        "bn1": _bn_params(sd, "bn1"),
        "fc2": _dense(sd, "fc2"),
        "bn2": _bn_params(sd, "bn2"),
        "fc3": _dense(sd, "fc3"),
    }
    stats = {
        "feat": enc_s,
        "bn1": _bn_stats(sd, "bn1"),
        "bn2": _bn_stats(sd, "bn2"),
    }
    return {"params": params, "batch_stats": stats}


def convert_pointnet_seg(sd: Dict, feature_transform: bool = False):
    enc_p, enc_s = _encoder(sd, "feat", feature_transform)
    head_p, head_s = _shared_mlp(
        sd, ["conv1", "conv2", "conv3"], ["bn1", "bn2", "bn3"]
    )
    params = {"feat": enc_p, "head": head_p, "out": _dense(sd, "conv4")}
    stats = {"feat": enc_s, "head": head_s}
    return {"params": params, "batch_stats": stats}


def _sa(sd, prefix, n_layers):
    return _shared_mlp(
        sd,
        [f"{prefix}.mlp_convs.{i}" for i in range(n_layers)],
        [f"{prefix}.mlp_bns.{i}" for i in range(n_layers)],
    )


def convert_pointnet2_semseg(sd: Dict):
    params, stats = {}, {}
    for name, n in [("sa1", 3), ("sa2", 3), ("sa3", 3), ("sa4", 3)]:
        p, s = _sa(sd, name, n)
        params[name] = {"mlp": p}
        stats[name] = {"mlp": s}
    for name, n in [("fp4", 2), ("fp3", 2), ("fp2", 2), ("fp1", 3)]:
        p, s = _sa(sd, name, n)
        params[name] = {"mlp": p}
        stats[name] = {"mlp": s}
    params["conv1"] = _dense(sd, "conv1")
    params["bn1"] = _bn_params(sd, "bn1")
    stats["bn1"] = _bn_stats(sd, "bn1")
    params["conv2"] = _dense(sd, "conv2")
    return {"params": params, "batch_stats": stats}


def _cls_head(sd, prefix="head"):
    params = {
        "fc1": _dense(sd, f"{prefix}.fc1"),
        "bn1": _bn_params(sd, f"{prefix}.bn1"),
        "fc2": _dense(sd, f"{prefix}.fc2"),
        "bn2": _bn_params(sd, f"{prefix}.bn2"),
        "fc3": _dense(sd, f"{prefix}.fc3"),
    }
    stats = {
        "bn1": _bn_stats(sd, f"{prefix}.bn1"),
        "bn2": _bn_stats(sd, f"{prefix}.bn2"),
    }
    return params, stats


def convert_pointnet2_cls_ssg(sd: Dict):
    params, stats = {}, {}
    for name in ("sa1", "sa2", "sa3"):
        p, s = _sa(sd, name, 3)
        params[name] = {"mlp": p}
        stats[name] = {"mlp": s}
    params["head"], stats["head"] = _cls_head(sd)
    return {"params": params, "batch_stats": stats}


def convert_pointnet2_cls_msg(sd: Dict):
    params, stats = {}, {}
    for name in ("sa1", "sa2"):
        p_branches, s_branches = {}, {}
        for b in range(3):
            p, s = _shared_mlp(
                sd,
                [f"{name}.conv_blocks.{b}.{i}" for i in range(3)],
                [f"{name}.bn_blocks.{b}.{i}" for i in range(3)],
            )
            p_branches[f"branch_{b}"] = p
            s_branches[f"branch_{b}"] = s
        params[name] = p_branches
        stats[name] = s_branches
    p, s = _sa(sd, "sa3", 3)
    params["sa3"] = {"mlp": p}
    stats["sa3"] = {"mlp": s}
    params["head"], stats["head"] = _cls_head(sd)
    return {"params": params, "batch_stats": stats}


def input_width(model_name: str, variables) -> int:
    """Input feature width (channels of ``points``) implied by converted or
    restored weights — derived from the first layer's kernel shape instead
    of name heuristics, so e.g. a 9-channel ``pointnet_seg`` checkpoint and
    a 3-channel one are both handled.

    Width relations (see the corresponding flax models):
      * pointnet_cls / pointnet_seg: encoder ``conv1`` consumes the raw
        points, so width == its kernel's input dim.
      * pointnet2_semseg: SA1's MLP consumes ``[rel_xyz(3), full points]``,
        so width == input dim - 3.
      * pointnet2_cls_*: SA1's MLP consumes ``[rel_xyz(3), points[..., 3:]]``,
        so width == input dim (3 when no extra features, 6 with normals).
    """
    p = variables["params"]
    if model_name in ("pointnet_cls", "pointnet_seg"):
        return int(np.asarray(p["feat"]["conv1"]["kernel"]).shape[0])
    if model_name == "pointnet2_semseg":
        return int(np.asarray(p["sa1"]["mlp"]["dense_0"]["kernel"]).shape[0]) - 3
    if model_name == "pointnet2_cls_ssg":
        return int(np.asarray(p["sa1"]["mlp"]["dense_0"]["kernel"]).shape[0])
    if model_name == "pointnet2_cls_msg":
        return int(
            np.asarray(p["sa1"]["branch_0"]["dense_0"]["kernel"]).shape[0]
        )
    raise KeyError(f"unknown model {model_name}")


CONVERTERS = {
    "pointnet_cls": convert_pointnet_cls,
    "pointnet_seg": convert_pointnet_seg,
    "pointnet2_cls_ssg": convert_pointnet2_cls_ssg,
    "pointnet2_cls_msg": convert_pointnet2_cls_msg,
    "pointnet2_semseg": convert_pointnet2_semseg,
}
