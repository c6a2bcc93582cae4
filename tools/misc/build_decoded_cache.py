#!/usr/bin/env python
"""One-time decoded-image cache builder (see yunet_tpu/data/cache.py).

  python tools/misc/build_decoded_cache.py yunet_n --cache-dir data/decoded
  python tools/train.py yunet_n --cfg-options \
      data.decoded_cache=\"data/decoded\"
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config", help="yunet_n | yunet_s")
    p.add_argument("--cache-dir", required=True)
    p.add_argument("--ann", default=None)
    p.add_argument("--img-prefix", default=None)
    p.add_argument("--workers", type=int, default=os.cpu_count())
    args = p.parse_args(argv)

    from yunet_tpu.config import get_config
    from yunet_tpu.data.cache import build_decoded_cache

    cfg = get_config(args.config)
    n = build_decoded_cache(
        args.ann or cfg.data.train_ann,
        args.img_prefix or cfg.data.train_img_prefix,
        args.cache_dir, workers=args.workers)
    print(f"decoded {n} new images into {args.cache_dir}")


if __name__ == "__main__":
    main()
