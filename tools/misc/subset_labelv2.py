#!/usr/bin/env python
"""Write a deterministic subset of a labelv2 annotation file.

Used to size a training split to the HBM image-bank budget of one chip
(data/device_aug.py capacity guard): e.g. the 12,880-image hard-tier XL
split at the fidelity-preserving bank geometry does not fit one 16 GB
v5e, so the round-5 scaled rehearsal trains on every 2nd image (6,440
images — interleaved, preserving the size/difficulty distribution) while the
full split remains the multi-chip (bank_sharded) target.

labelv2 format (reference mmdet/datasets/retinaface.py:29-100):
  # <path> <W> <H>
  <face line>*
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("--out", required=True)
    ap.add_argument("--every", type=int, default=2,
                    help="keep every Nth image record (default 2)")
    ap.add_argument("--offset", type=int, default=0)
    args = ap.parse_args()

    records = []   # list of [header, face lines...]
    with open(args.src) as f:
        for ln in f:
            if ln.startswith("#"):
                records.append([ln])
            elif records:
                records[-1].append(ln)
    kept = records[args.offset::args.every]
    with open(args.out, "w") as f:
        for rec in kept:
            f.writelines(rec)
    print(f"kept {len(kept)} of {len(records)} image records -> {args.out}")


if __name__ == "__main__":
    main()
