#!/usr/bin/env python
"""Round-5 GhostBN decomposition A/B battery (VERDICT r4 #1).

Round 4 left a 7.5-hard-pt gap between the recipe config (b16/lr0.01,
BN over 16 samples, 22,200 steps) and the throughput config (b128 +
scaled LR, BN over 128, 2,400 steps) at matched epochs, with two
confounded factors: BN-statistics noise scale and 9x fewer optimizer
steps. GhostBN (train.bn_group=16, models/layers.py batch_norm
group_size) reproduces the recipe's per-GPU BN-16 statistics inside
the b128 program (reference trains BN locally over samples_per_gpu=16,
configs/yunet_n.py:30), so the grid below decomposes the gap:

  leg           batch  lr    BN stats   epochs  steps   isolates
  ghost16_lr04  128    0.04  ghost-16   600     2400    BN factor at scaled LR
  ghost16_lr01  128    0.01  ghost-16   600     2400    BN factor at recipe LR
  std_lr01      128    0.01  whole-128  600     2400    LR factor alone
  msteps_lr04   128    0.04  whole-128  5550    22200   step-count bound
                                                        (matched optimizer steps,
                                                        LR decay at the recipe's
                                                        0.625/0.85 fractions)

Round-4 anchors (docs/ab_r04, same 600-image hard-tier dataset, same
64-image hard val, non-EMA params): b16/lr0.01 -> hard .8583;
b128/lr0.04 std BN -> .7836; b128/lr0.04 3x budget -> .8385.

All legs run sequentially on the one tunnel chip; each leg is a
run_rehearsal.py invocation (no kill leg) with EMA off to match the
round-4 table.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

LEGS = [
    ("ab_r05_ghost16_lr04", ["--epochs", "600", "--eval-interval", "150",
                             "--lr", "0.04",
                             "--cfg-options", "train.bn_group=16"]),
    ("ab_r05_ghost16_lr01", ["--epochs", "600", "--eval-interval", "150",
                             "--lr", "0.01",
                             "--cfg-options", "train.bn_group=16"]),
    ("ab_r05_std_lr01", ["--epochs", "600", "--eval-interval", "150",
                         "--lr", "0.01"]),
    ("ab_r05_msteps_lr04", ["--epochs", "5550", "--eval-interval", "1110",
                            "--lr", "0.04",
                            "--cfg-options",
                            "train.lr_decay_epochs=(3469,4718)"]),
]


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    only = set(argv)
    for name, extra in LEGS:
        if only and name not in only:
            continue
        wd = os.path.join(REPO, "work_dirs", name)
        cmd = [sys.executable,
               os.path.join(REPO, "tools", "misc", "run_rehearsal.py"),
               "--data", "data/synth_wider_hard",
               "--work-dir", wd,
               "--ema-momentum", "0"] + extra
        print(f"[ab_r05] leg {name}: {' '.join(cmd)}", flush=True)
        t0 = time.time()
        code = subprocess.call(cmd, cwd=REPO)
        print(f"[ab_r05] leg {name} exited {code} "
              f"in {time.time() - t0:.0f}s", flush=True)
        if code != 0:
            return code
    # summary table from each leg's final val record
    print("[ab_r05] summary (last val record per leg):", flush=True)
    for name, _ in LEGS:
        mp = os.path.join(REPO, "work_dirs", name, "metrics.jsonl")
        last = None
        if os.path.exists(mp):
            with open(mp) as f:
                for ln in f:
                    try:
                        r = json.loads(ln)
                    except json.JSONDecodeError:
                        continue
                    if r.get("mode") == "val":
                        last = r
        print(f"  {name}: {json.dumps(last)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
