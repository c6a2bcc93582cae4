"""Dataclass configuration system with the two shipped presets.

Mirrors the declarative surface of the reference python-file configs
(/root/reference/configs/yunet_n.py, yunet_s.py) without the mmcv Config /
registry machinery: configs are plain frozen dataclasses, presets are
functions, and CLI overrides use the same dotted-key syntax as the
reference's ``--cfg-options`` (tools/train.py:72-81 in the reference).
"""

from __future__ import annotations

import ast
import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Sequence, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Architecture plan. Defaults follow reference configs/yunet_n.py:104-131."""

    name: str = "yunet_n"
    # backbone: list of per-stage channel plans; stage 0 is the stem
    # (in, mid, out); later stages are Conv4layerBlocks (in, out).
    stage_channels: Tuple[Tuple[int, ...], ...] = (
        (3, 16, 16), (16, 64), (64, 64), (64, 64), (64, 64), (64, 64))
    downsample_idx: Tuple[int, ...] = (0, 2, 3, 4)
    out_idx: Tuple[int, ...] = (3, 4, 5)
    # neck
    neck_in_channels: Tuple[int, ...] = (64, 64, 64)
    # head
    num_classes: int = 1
    head_in_channels: int = 64
    feat_channels: int = 64
    shared_stacked_convs: int = 1
    stacked_convs: int = 0
    use_kps: bool = True
    kps_num: int = 5
    strides: Tuple[int, ...] = (8, 16, 32)
    prior_offset: float = 0.0
    # memory knob (training only, bit-exact): backbone stages to
    # rematerialize in the backward pass instead of saving their ~419 MB
    # (at b128/640^2) intermediate activations. MEASURED SLOWER on an
    # HBM-bound step (b128: 1569 -> 1511/1465/1390 img/s for stages
    # 0/01/012 — XLA materializes the recomputed tensors anyway, so the
    # extra passes outweigh the saved residuals); useful only to fit
    # larger batches/resolutions in HBM.
    remat_stages: Tuple[int, ...] = ()
    # run every ConvDPUnit's pw(1x1)+dw(3x3) pair (no nonlinearity
    # between, reference yunet_layer.py:4-36) as ONE composed dense 3x3
    # conv W[ky,kx,i,o] = pw[i,o]*dw[ky,kx,o] (+ exact border-bias
    # field): removes the pointwise intermediate's HBM round-trip in
    # both directions at ~6x the MXU MACs — a traffic-for-FLOPs trade
    # on the HBM-bound train step (models/layers.py:_composed_pw_dw).
    # TRAIN-mode forwards only; measured +5.3% step throughput at
    # b128/640² (1591 -> 1676 img/s interleaved,
    # bench_train_step --convdp plain,composed)
    composed_dp: bool = True


@dataclass(frozen=True)
class LossConfig:
    """Loss weights / shapes. Reference configs/yunet_n.py:118-131."""

    cls_weight: float = 1.0
    bbox_weight: float = 5.0
    obj_weight: float = 1.0
    kps_weight: float = 0.1
    kps_beta: float = 1.0 / 9.0  # SmoothL1 beta
    eiou_smooth_point: float = 0.1
    eiou_eps: float = 1e-6


@dataclass(frozen=True)
class AssignerConfig:
    """SimOTA knobs. Reference core/bbox/assigners/sim_ota_assigner.py:28-36."""

    center_radius: float = 2.5
    candidate_topk: int = 10
    iou_weight: float = 3.0
    cls_weight: float = 1.0


@dataclass(frozen=True)
class TestConfig:
    """Decode/NMS at test time. Reference configs/yunet_n.py:139-145."""

    score_thr: float = 0.02
    nms_iou_thr: float = 0.45
    max_per_img: int = -1  # -1: keep everything above score_thr
    # static cap for the on-device NMS path (host C++ NMS has no cap)
    device_nms_pre: int = 5000


@dataclass(frozen=True)
class DataConfig:
    """Dataset paths + augmentation. Reference configs/yunet_n.py:23-78."""

    data_root: str = "data/widerface/"
    train_ann: str = "data/widerface/labelv2/train/labelv2.txt"
    train_img_prefix: str = "data/widerface/WIDER_train/images/"
    val_ann: str = "data/widerface/labelv2/val/labelv2.txt"
    val_img_prefix: str = "data/widerface/WIDER_val/images/"
    gt_dir: str = "data/widerface/labelv2/val/gt/"
    img_size: int = 640
    # RandomSquareCrop scale choices (yunet_n uses 0.5..1.5; yunet_s 0.3..1.0)
    crop_choice: Tuple[float, ...] = (0.5, 0.7, 0.9, 1.1, 1.3, 1.5)
    flip_ratio: float = 0.5
    # static GT padding per image (replaces DataContainer dynamic batching)
    max_gts: int = 128
    samples_per_device: int = 16
    workers: int = 4
    min_size: float | None = None
    # input-pipeline accelerators (data/cache.py): a decoded-image cache
    # dir (one-time JPEG decode -> mmap'd raw arrays), and/or reduced
    # libjpeg decode when the crop is downscaled anyway
    decoded_cache: str | None = None
    reduced_decode: bool = False
    # HBM-staged dataset + on-device crop/resize/flip (data/device_aug.py):
    # host ships only crop geometry + GTs per step — for hosts whose CPU
    # or host->device link cannot feed the chip
    device_aug: bool = False
    bank_size: int = 640       # staged short-side resolution
    bank_canvas: int = 1152    # square canvas (>= 1.5 * bank_size + slack)
    # shard the staged bank over the 'dp' mesh axis (each chip holds and
    # samples only its slice — for datasets too large to replicate)
    bank_sharded: bool = False


@dataclass(frozen=True)
class TrainConfig:
    """Optimization recipe. Reference configs/yunet_n.py:1-12."""

    lr: float = 0.01
    base_total_batch: int = 32  # 2 GPUs x 16 in the reference recipe
    # Linear LR scaling from base_total_batch. Off by default to match the
    # reference: mmdet only rescales when auto_scale_lr is explicitly
    # enabled (mmdet/apis/train.py:71-114), and the shipped configs don't.
    auto_scale_lr: bool = False
    momentum: float = 0.9
    weight_decay: float = 5e-4
    warmup_iters: int = 1500
    warmup_ratio: float = 0.001
    lr_decay_epochs: Tuple[int, ...] = (400, 544)
    lr_decay_factor: float = 0.1
    max_epochs: int = 640
    checkpoint_interval: int = 80  # epochs
    log_interval: int = 50  # iters
    seed: int = 0
    # numerics: bf16 activations in the conv trunk, f32 losses/decode
    bf16: bool = True
    # Pallas fused pw->dw kernels (custom VJP) for the trunk convs
    fused_kernels: bool = False
    # Streaming Pallas SimOTA (ops/simota_pallas.py) on TPU; the dense
    # XLA formulation is used off-TPU or when disabled
    pallas_simota: bool = True
    ema_momentum: float = 0.0  # 0 disables EMA (reference default: off)
    grad_clip: float = 0.0  # 0 disables (reference: grad_clip=None)
    # GhostBN: train-mode BatchNorm statistics over fixed groups of this
    # many samples inside each local batch (0 = whole local batch). 16
    # reproduces the reference recipe's per-GPU BN-16 noise
    # (configs/yunet_n.py:30 samples_per_gpu=16) inside a single
    # large-batch program — the big-batch throughput config then trains
    # with recipe-exact normalization statistics (models/layers.py
    # batch_norm).
    bn_group: int = 0


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    assigner: AssignerConfig = field(default_factory=AssignerConfig)
    test: TestConfig = field(default_factory=TestConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    work_dir: str = "./work_dirs/yunet_n"


def yunet_n() -> Config:
    """The shipped YuNet-n preset (reference configs/yunet_n.py)."""
    return Config()


def yunet_s() -> Config:
    """The shipped YuNet-s preset (reference configs/yunet_s.py):
    narrower stages, no shared head conv, tighter crop choices."""
    return Config(
        model=ModelConfig(
            name="yunet_s",
            stage_channels=((3, 16, 16), (16, 32), (32, 64), (64, 64),
                            (64, 64), (64, 64)),
            shared_stacked_convs=0,
        ),
        data=DataConfig(crop_choice=(0.3, 0.45, 0.6, 0.8, 1.0)),
        work_dir="./work_dirs/yunet_s",
    )


_PRESETS = {"yunet_n": yunet_n, "yunet_s": yunet_s}


def get_config(name: str) -> Config:
    if name not in _PRESETS:
        raise KeyError(f"unknown config '{name}'; have {sorted(_PRESETS)}")
    cfg = _PRESETS[name]()
    root = os.environ.get("YUNET_DATA_ROOT")
    if root:
        cfg = _retarget_data_root(cfg, root)
    return cfg


def _retarget_data_root(cfg: Config, root: str) -> Config:
    """Repoint dataset paths at another root (the reference honors an
    MMDET_DATASETS env override, utils/misc.py:45-76)."""
    d = cfg.data
    old = d.data_root

    def sub(p: str) -> str:
        return p.replace(old, root.rstrip("/") + "/", 1) \
            if p.startswith(old) else p

    new_d = dataclasses.replace(
        d, data_root=root, train_ann=sub(d.train_ann),
        train_img_prefix=sub(d.train_img_prefix), val_ann=sub(d.val_ann),
        val_img_prefix=sub(d.val_img_prefix), gt_dir=sub(d.gt_dir))
    return dataclasses.replace(cfg, data=new_d)


def validate_config(cfg: Config, *, force_experimental: bool = False
                    ) -> Config:
    """Reject measured-loser / inconsistent flag combinations.

    Several knobs exist because they were implemented, measured, and
    parked with a root cause (COMPONENTS.md kernel-experiment tables);
    they stay in the tree as documented experiments, but the product
    surface should not silently train with a known-slower or
    known-broken combination. ``force_experimental=True``
    (--force-experimental on the CLIs) re-enables them deliberately.

    Raises ValueError on a parked combination (unless forced) and on
    outright inconsistencies (always).
    """
    # --- hard inconsistencies: never allowed -----------------------------
    if cfg.data.bank_sharded and not cfg.data.device_aug:
        raise ValueError(
            "data.bank_sharded=true requires data.device_aug=true "
            "(the bank only exists on the device_aug path)")
    if cfg.train.bn_group < 0:
        raise ValueError("train.bn_group must be >= 0")
    if (cfg.train.bn_group > 0
            and cfg.data.samples_per_device % cfg.train.bn_group):
        raise ValueError(
            f"train.bn_group={cfg.train.bn_group} must divide the local "
            f"batch data.samples_per_device={cfg.data.samples_per_device} "
            "(GhostBN reshapes the batch into fixed groups)")
    if cfg.data.device_aug and cfg.data.bank_canvas < cfg.data.bank_size:
        raise ValueError(
            f"data.bank_canvas={cfg.data.bank_canvas} must be >= "
            f"data.bank_size={cfg.data.bank_size}")

    # --- measured-and-parked combinations: need --force-experimental -----
    parked = []
    if cfg.train.fused_kernels:
        parked.append(
            "train.fused_kernels=true: the Pallas fused pw->dw training "
            "kernels are MEASURED SLOWER than the composed-conv XLA path "
            "at b128/640^2 (ops/convdp_train_pallas.py root-cause notes); "
            "the shipped winner is model.composed_dp=true")
    if cfg.model.remat_stages:
        parked.append(
            f"model.remat_stages={cfg.model.remat_stages}: measured "
            "~4-11% slower at b128/640^2 (the step is HBM-bound; XLA "
            "materializes the recomputed tensors anyway, config.py "
            "remat_stages note). It is a memory lever for batches that "
            "do not otherwise fit — force it only for that")
    if parked and not force_experimental:
        raise ValueError(
            "config uses measured-and-parked experimental flags:\n  - "
            + "\n  - ".join(parked)
            + "\npass --force-experimental (CLI) or "
            "validate_config(..., force_experimental=True) to run anyway")
    return cfg


def _coerce(value: str) -> Any:
    # lowercase true/false/none are what users actually type on a CLI;
    # ast.literal_eval only accepts the Python spellings, and the
    # fall-through returned the truthy STRING "false" (silently leaving
    # e.g. train.bf16 enabled — found by the f32 A/B run duplicating the
    # bf16 run bit-for-bit)
    low = value.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("none", "null"):
        return None
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def apply_overrides(cfg: Config, options: Sequence[str]) -> Config:
    """Apply ``section.key=value`` overrides (reference --cfg-options)."""
    for opt in options:
        key, _, raw = opt.partition("=")
        parts = key.strip().split(".")
        value = _coerce(raw.strip())
        cfg = _replace_path(cfg, parts, value)
    return cfg


def _replace_path(node: Any, parts: Sequence[str], value: Any) -> Any:
    head = parts[0]
    if not dataclasses.is_dataclass(node) or head not in {
            f.name for f in dataclasses.fields(node)}:
        raise KeyError(f"no config field '{head}' on {type(node).__name__}")
    if len(parts) == 1:
        current = getattr(node, head)
        if isinstance(current, tuple) and isinstance(value, list):
            value = tuple(value)
        if isinstance(current, bool) and not isinstance(value, bool):
            raise ValueError(
                f"config field '{head}' is a bool; got {value!r} "
                "(use true/false)")
        return dataclasses.replace(node, **{head: value})
    child = _replace_path(getattr(node, head), parts[1:], value)
    return dataclasses.replace(node, **{head: child})
