#!/usr/bin/env python
"""Print the fully-resolved config (reference tools/misc/print_config.py).

  python tools/misc/print_config.py yunet_n --cfg-options train.lr=0.02
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config", help="yunet_n | yunet_s")
    p.add_argument("--cfg-options", nargs="*", default=[])
    args = p.parse_args(argv)

    from yunet_tpu.config import apply_overrides, get_config

    cfg = apply_overrides(get_config(args.config), args.cfg_options)
    print(json.dumps(dataclasses.asdict(cfg), indent=2, default=str))


if __name__ == "__main__":
    main()
