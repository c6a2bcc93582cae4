from .layers import (conv_dp_unit, conv_dp_unit_init, conv_head,
                     conv_head_init, conv4layer_block, conv4layer_block_init)
from .backbone import yunet_backbone, yunet_backbone_init
from .neck import tfpn, tfpn_init
from .head import yunet_head, yunet_head_init
from .detector import YuNet

__all__ = [
    "conv_dp_unit", "conv_dp_unit_init", "conv_head", "conv_head_init",
    "conv4layer_block", "conv4layer_block_init", "yunet_backbone",
    "yunet_backbone_init", "tfpn", "tfpn_init", "yunet_head",
    "yunet_head_init", "YuNet",
]
