"""YuNet detector: backbone -> neck -> head composition.

Mirrors the composition of the reference SingleStageDetector/YuNet
(mmdet/models/detectors/single_stage.py:10-158, detectors/yunet.py:8-86) as
a thin stateless class holding only the static architecture plan; all
tensors live in explicit (params, state) pytrees so the same object drives
jit/grad/shard_map without tracing hazards.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .backbone import yunet_backbone, yunet_backbone_init
from .head import flatten_level_outputs, yunet_head, yunet_head_init
from .neck import tfpn, tfpn_init


class YuNet:
    """Static architecture wrapper. Hashable/const — safe to close over in jit."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg

    # -- init ---------------------------------------------------------------
    def init(self, key) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        kb, kn, kh = jax.random.split(key, 3)
        pb, sb = yunet_backbone_init(kb, self.cfg.stage_channels)
        pn, sn = tfpn_init(kn, self.cfg.neck_in_channels)
        ph, sh = yunet_head_init(
            kh, num_levels=len(self.cfg.strides),
            in_channels=self.cfg.head_in_channels,
            feat_channels=self.cfg.feat_channels,
            shared_stacked_convs=self.cfg.shared_stacked_convs,
            num_classes=self.cfg.num_classes, kps_num=self.cfg.kps_num,
            use_kps=self.cfg.use_kps)
        return ({"backbone": pb, "neck": pn, "head": ph},
                {"backbone": sb, "neck": sn, "head": sh})

    # -- forward ------------------------------------------------------------
    def extract_feat(self, params, state, x, *, train: bool = False,
                     fused: bool = False, bn_group: int = 0):
        # composed mode is a training-traffic optimization; eval/serve
        # forwards keep the factored pair (the serve path has its own
        # per-batch fused/plain selection, and the intermediates are
        # small at serve shapes)
        composed = self.cfg.composed_dp and train
        feats, ns_b = yunet_backbone(
            params["backbone"], state["backbone"], x,
            downsample_idx=self.cfg.downsample_idx,
            out_idx=self.cfg.out_idx, train=train, fused=fused,
            composed=composed, bn_group=bn_group,
            remat_stages=self.cfg.remat_stages)
        feats, ns_n = tfpn(params["neck"], state["neck"], feats,
                           out_idx=tuple(range(len(feats))), train=train,
                           fused=fused, composed=composed,
                           bn_group=bn_group)
        return feats, {"backbone": ns_b, "neck": ns_n}

    def forward(self, params, state, x, *, train: bool = False,
                fused: bool = False, bn_group: int = 0):
        """x: (B, H, W, 3) raw 0-255 BGR float (the network eats unnormalized
        pixels; reference img_norm_cfg is identity, configs/yunet_n.py:27).

        bn_group: GhostBN group size for train-mode BatchNorm statistics
        (0 = whole local batch; see models/layers.py batch_norm).

        Returns (per-level output dict, new_state).
        """
        feats, ns = self.extract_feat(params, state, x, train=train,
                                      fused=fused, bn_group=bn_group)
        outs, ns_h = yunet_head(params["head"], state["head"], feats,
                                train=train, fused=fused,
                                composed=self.cfg.composed_dp and train,
                                bn_group=bn_group)
        ns["head"] = ns_h
        return outs, ns

    def forward_flat(self, params, state, x, *, train: bool = False,
                     fused: bool = False, bn_group: int = 0):
        """Forward + per-level flatten to (B, P, C) tensors (prior order)."""
        outs, ns = self.forward(params, state, x, train=train, fused=fused,
                                bn_group=bn_group)
        return flatten_level_outputs(outs), ns

    def feature_test(self, params, state, x) -> List[jnp.ndarray]:
        """Raw multi-level outputs flattened in the fixed order the
        reference export uses (yunet.py:69-86 / yunet2onnx.py:89-94):
        cls_8, cls_16, cls_32, obj_8..32, bbox_8..32, kps_8..32."""
        outs, _ = self.forward(params, state, x, train=False)
        ordered = []
        for k in ("cls", "obj", "bbox", "kps"):
            for m in outs[k]:
                ordered.append(m.reshape(m.shape[0], -1, m.shape[-1]))
        return ordered

    def featmap_sizes(self, h: int, w: int) -> List[Tuple[int, int]]:
        # inputs are always padded to a multiple of 32, so division is exact
        return [(h // s, w // s) for s in self.cfg.strides]

    @property
    def num_params(self) -> int:
        # fully abstract (eval_shape) so no device backend is initialized —
        # export tools call this and must not pay TPU-claim latency
        key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
        p, _ = jax.eval_shape(self.init, key_spec)
        import math
        return sum(math.prod(l.shape)
                   for l in jax.tree_util.tree_leaves(p))
