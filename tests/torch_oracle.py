"""Independent torch-based oracle for parity tests.

Executes the YuNet forward pass directly from a reference checkpoint's
state_dict using torch.nn.functional ops — a from-scratch interpreter of the
(deterministic) key layout, NOT an import of reference code. Used only in
tests to validate the JAX model numerically against the shipped weights.
"""

from __future__ import annotations

from typing import Dict, List

import torch
import torch.nn.functional as F


class Oracle:
    def __init__(self, sd: Dict[str, torch.Tensor],
                 shared_stacked_convs: int = 1):
        self.sd = {k: v.float() for k, v in sd.items()}
        self.shared = shared_stacked_convs

    def conv(self, x, prefix, stride=1, padding=0, groups=1):
        return F.conv2d(x, self.sd[f"{prefix}.weight"],
                        self.sd[f"{prefix}.bias"], stride=stride,
                        padding=padding, groups=groups)

    def bn(self, x, prefix):
        return F.batch_norm(x, self.sd[f"{prefix}.running_mean"],
                            self.sd[f"{prefix}.running_var"],
                            self.sd[f"{prefix}.weight"],
                            self.sd[f"{prefix}.bias"], training=False,
                            eps=1e-5)

    def conv_dp(self, x, prefix, with_bn=True):
        x = self.conv(x, f"{prefix}.conv1")
        c = self.sd[f"{prefix}.conv2.weight"].shape[0]
        x = self.conv(x, f"{prefix}.conv2", padding=1, groups=c)
        if with_bn:
            x = F.relu(self.bn(x, f"{prefix}.bn"))
        return x

    def backbone(self, x, downsample_idx=(0, 2, 3, 4), out_idx=(3, 4, 5),
                 num_stages=6) -> List[torch.Tensor]:
        outs = []
        # stem
        x = F.relu(self.bn(self.conv(x, "backbone.model0.conv1", stride=2,
                                     padding=1), "backbone.model0.bn1"))
        x = self.conv_dp(x, "backbone.model0.conv2")
        if 0 in out_idx:
            outs.append(x)
        if 0 in downsample_idx:
            x = F.max_pool2d(x, 2)
        for i in range(1, num_stages):
            x = self.conv_dp(x, f"backbone.model{i}.conv1")
            x = self.conv_dp(x, f"backbone.model{i}.conv2")
            if i in out_idx:
                outs.append(x)
            if i in downsample_idx:
                x = F.max_pool2d(x, 2)
        return outs

    def neck(self, feats: List[torch.Tensor]) -> List[torch.Tensor]:
        feats = list(feats)
        for i in range(len(feats) - 1, 0, -1):
            feats[i] = self.conv_dp(feats[i], f"neck.lateral_convs.{i}")
            feats[i - 1] = feats[i - 1] + F.interpolate(
                feats[i], scale_factor=2.0, mode="nearest")
        feats[0] = self.conv_dp(feats[0], "neck.lateral_convs.0")
        return feats

    def head(self, feats: List[torch.Tensor]) -> Dict[str, List[torch.Tensor]]:
        out = {"cls": [], "bbox": [], "obj": [], "kps": []}
        for lvl, feat in enumerate(feats):
            if self.shared > 0:
                for j in range(self.shared):
                    feat = self.conv_dp(
                        feat, f"bbox_head.multi_level_share_convs.{lvl}.{j}")
            out["cls"].append(self.conv_dp(
                feat, f"bbox_head.multi_level_cls.{lvl}", with_bn=False))
            out["bbox"].append(self.conv_dp(
                feat, f"bbox_head.multi_level_bbox.{lvl}", with_bn=False))
            out["obj"].append(self.conv_dp(
                feat, f"bbox_head.multi_level_obj.{lvl}", with_bn=False))
            out["kps"].append(self.conv_dp(
                feat, f"bbox_head.multi_level_kps.{lvl}", with_bn=False))
        return out

    def forward(self, x: torch.Tensor) -> Dict[str, List[torch.Tensor]]:
        """x: (B, 3, H, W) float raw-BGR. Returns per-level NCHW maps."""
        with torch.no_grad():
            return self.head(self.neck(self.backbone(x)))


def load_oracle(pth_path: str, shared_stacked_convs: int = 1) -> Oracle:
    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    return Oracle(ckpt["state_dict"], shared_stacked_convs)
