#!/usr/bin/env python
"""Model complexity report (reference tools/get_flops.py parity).

  python tools/get_flops.py yunet_n --shape 320 320
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config", help="yunet_n | yunet_s")
    p.add_argument("--shape", type=int, nargs="+", default=[320, 320])
    args = p.parse_args(argv)

    from yunet_tpu.config import get_config
    from yunet_tpu.models import YuNet
    from yunet_tpu.utils.flops import count_macs

    cfg = get_config(args.config)
    shape = (args.shape[0], args.shape[-1])
    macs = count_macs(cfg.model, shape)
    params = YuNet(cfg.model).num_params
    line = "=" * 30
    print(f"{line}\nInput shape: (3, {shape[0]}, {shape[1]})\n"
          f"Flops: {macs / 1e6:.2f} MFLOPs\nParams: {params:,}\n{line}")


if __name__ == "__main__":
    main()
