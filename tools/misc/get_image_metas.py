#!/usr/bin/env python
"""Collect per-image metadata (filename, width, height, face count) to a
pickle — reference tools/misc/get_image_metas.py role (offline meta
collection so eval tooling can bucket by size without reading images).

  python tools/misc/get_image_metas.py yunet_n --split val --out metas.pkl
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config", help="yunet_n | yunet_s")
    p.add_argument("--split", default="val", choices=["train", "val"])
    p.add_argument("--out", default="image_metas.pkl")
    p.add_argument("--ann", default=None)
    args = p.parse_args(argv)

    from yunet_tpu.config import get_config
    from yunet_tpu.data import parse_labelv2

    cfg = get_config(args.config)
    ann = args.ann or (cfg.data.train_ann if args.split == "train"
                       else cfg.data.val_ann)
    records = parse_labelv2(ann, test_mode=args.split == "val")
    metas = [{"filename": r.filename, "width": r.width,
              "height": r.height, "num_faces": int(r.bboxes.shape[0]),
              "num_ignore": int(r.bboxes_ignore.shape[0]),
              "pad_shape_32": (-(-r.height // 32) * 32,
                               -(-r.width // 32) * 32)}
             for r in records]
    with open(args.out, "wb") as f:
        pickle.dump(metas, f)
    sizes = {m["pad_shape_32"] for m in metas}
    print(f"wrote {len(metas)} metas to {args.out}; "
          f"{len(sizes)} distinct /32-padded shapes")


if __name__ == "__main__":
    main()
