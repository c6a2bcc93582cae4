#!/usr/bin/env python
"""Visualize post-pipeline training samples
(reference tools/misc/browse_dataset.py role).

  python tools/misc/browse_dataset.py yunet_n --output-dir /tmp/aug -n 16
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config", help="yunet_n | yunet_s")
    p.add_argument("--output-dir", default="./browse_out")
    p.add_argument("-n", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ann", default=None)
    p.add_argument("--img-prefix", default=None)
    args = p.parse_args(argv)

    import numpy as np

    from yunet_tpu.config import get_config
    from yunet_tpu.data.dataset import SampleSpec, WiderFaceDataset
    from yunet_tpu.train.hooks import AugDump

    cfg = get_config(args.config)
    spec = SampleSpec(img_size=cfg.data.img_size, max_gts=cfg.data.max_gts,
                      crop_choice=cfg.data.crop_choice,
                      flip_ratio=cfg.data.flip_ratio)
    ds = WiderFaceDataset(args.ann or cfg.data.train_ann,
                          args.img_prefix or cfg.data.train_img_prefix,
                          spec)
    dump = AugDump(args.output_dir, max_images=args.n)
    rng = np.random.RandomState(args.seed)
    for i in range(args.n):
        idx = rng.randint(len(ds))
        s = ds.get_train_sample(idx, rng)
        dump.update({k: v[None] for k, v in s.items()
                     if k != "num_overflow"})
    print(f"wrote {dump.n} samples to {args.output_dir}")


if __name__ == "__main__":
    main()
