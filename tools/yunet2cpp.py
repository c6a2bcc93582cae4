#!/usr/bin/env python
"""Generate facedetectcnn-data.cpp for libfacedetection
(reference tools/yunet2cpp.py parity: conv-BN folding, depthwise (9,C)
layout, stem 3x3x3 repack + zero-pad to 32 channels).

  python tools/yunet2cpp.py yunet_n ckpt.pth \
      --output-file work_dirs/facedetectcnn-data.cpp
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config", help="yunet_n | yunet_s")
    p.add_argument("checkpoint")
    p.add_argument("--output-file",
                   default="./work_dirs/facedetectcnn-data.cpp")
    p.add_argument("--no-summary", action="store_true")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")  # pure host-side tool
    from yunet_tpu.config import get_config
    from yunet_tpu.export import generate_cpp
    from yunet_tpu.models import YuNet
    from yunet_tpu.utils.flops import count_macs
    from detect_image import load_weights

    cfg = get_config(args.config)
    params, state = load_weights(cfg, args.checkpoint)

    if not args.no_summary:
        line = "=" * 30
        print(f"{line}\nInput shape: (3, 320, 320)\n"
              f"Flops: {count_macs(cfg.model) / 1e6:.2f} MFLOPs\n"
              f"Params: {YuNet(cfg.model).num_params:,}\n{line}")

    src = generate_cpp(params, state, cfg.model)
    os.makedirs(os.path.dirname(os.path.abspath(args.output_file)),
                exist_ok=True)
    with open(args.output_file, "w") as f:
        f.write(src)
    print("Convert successful!")
    print(f"From {args.config} with {args.checkpoint}\n"
          f"To {args.output_file}")


if __name__ == "__main__":
    main()
