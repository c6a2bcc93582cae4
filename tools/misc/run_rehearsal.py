#!/usr/bin/env python
"""Training dress rehearsal driver (reference SURVEY §5 failure-recovery
evidence; round-3 VERDICT #1 asked for the same run at an unsaturated
operating point).

Runs the blessed recipe end-to-end on a synthetic WIDER-shaped dataset:

  tools/train.py <preset> at b128/640², device_aug HBM bank, EMA on,
  WIDER eval hook every --eval-interval epochs, checkpoints every 80
  epochs — then SIGKILLs the trainer once metrics.jsonl crosses
  --kill-at, relaunches with --auto-resume, and verifies the resumed
  leg reproduces the killed leg's post-checkpoint losses bit-exactly
  (the reference's resume_from contract, mmcv runner checkpoint hook).

Usage (round-4 hard-tier rehearsal, docs/rehearsal_r04/):

  python tools/misc/run_rehearsal.py --data data/synth_wider_hard \
      --work-dir work_dirs/rehearsal_r04 --epochs 600 --kill-at 1620
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def train_cmd(args):
    d = args.data
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "train.py"),
        args.config,
        "--work-dir", args.work_dir,
        "--seed", str(args.seed),
        "--auto-resume",
        "--eval-interval", str(args.eval_interval),
        "--eval-mode", "2",
        "--cfg-options",
        f"data.train_ann={d}/train/labelv2.txt",
        f"data.train_img_prefix={d}/train/images/",
        f"data.val_ann={d}/val/labelv2.txt",
        f"data.val_img_prefix={d}/val/images/",
        f"data.gt_dir={d}/val/gt/",
        f"data.device_aug={'true' if args.device_aug else 'false'}",
        f"data.samples_per_device={args.batch}",
        f"train.max_epochs={args.epochs}",
        f"train.ema_momentum={args.ema_momentum}",
    ]
    if args.lr is not None:
        cmd.append(f"train.lr={args.lr}")
    if args.decoded_cache:
        cmd.append(f"data.decoded_cache={args.decoded_cache}")
    cmd += args.cfg_options
    if args.eval_both_params:
        cmd.append("--eval-both-params")
    return cmd


def run_leg(cmd, log_path, metrics_path, kill_at=None):
    """Run one trainer leg; if kill_at, SIGKILL once metrics.jsonl shows a
    train step >= kill_at. Returns (exit_code, killed)."""
    log = open(log_path, "a")
    proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                            cwd=REPO)
    killed = False
    try:
        while proc.poll() is None:
            time.sleep(2.0)
            if kill_at is None or not os.path.exists(metrics_path):
                continue
            with open(metrics_path) as f:
                for ln in f:
                    try:
                        r = json.loads(ln)
                    except json.JSONDecodeError:
                        continue
                    if r.get("mode") == "train" and r.get("step", 0) >= kill_at:
                        print(f"[rehearsal] killing trainer at step "
                              f">= {kill_at} (pid {proc.pid})", flush=True)
                        proc.send_signal(signal.SIGKILL)
                        proc.wait()
                        killed = True
                        break
                if killed:
                    break
    finally:
        log.close()
    return proc.wait(), killed


def check_resume_bitexact(metrics_path):
    """The resumed leg re-logs steps after the restored checkpoint; any
    step logged by both legs must carry the identical loss."""
    by_step = {}
    dup, exact = 0, 0
    with open(metrics_path) as f:
        for ln in f:
            try:
                r = json.loads(ln)
            except json.JSONDecodeError:
                # a SIGKILLed leg 1 can leave a truncated trailing line
                # that leg 2 then appends after — skip it, as run_leg does
                continue
            if r.get("mode") != "train":
                continue
            s = r["step"]
            if s in by_step:
                dup += 1
                if by_step[s] == r["loss"]:
                    exact += 1
                else:
                    print(f"[rehearsal] MISMATCH step {s}: "
                          f"{by_step[s]} vs {r['loss']}", flush=True)
            else:
                by_step[s] = r["loss"]
    return dup, exact


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="yunet_n")
    p.add_argument("--data", default="data/synth_wider_hard")
    p.add_argument("--work-dir", default="work_dirs/rehearsal_r04")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--epochs", type=int, default=600)
    p.add_argument("--eval-interval", type=int, default=250)
    p.add_argument("--ema-momentum", type=float, default=0.0002)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--kill-at", type=int, default=0,
                   help="SIGKILL the first leg at this train step, then "
                        "auto-resume (0 = single uninterrupted leg)")
    p.add_argument("--device-aug", dest="device_aug", action="store_true",
                   default=True,
                   help="HBM-staged bank + on-device aug (default)")
    p.add_argument("--no-device-aug", dest="device_aug",
                   action="store_false",
                   help="host cv2 pipeline instead (the path for datasets "
                        "the HBM capacity guard rejects on one chip)")
    p.add_argument("--decoded-cache", default=None,
                   help="decoded-image cache dir for the host pipeline "
                        "(data/cache.py; one-time decode -> mmap)")
    p.add_argument("--eval-both-params", action="store_true",
                   help="evaluate BOTH EMA and raw params each interval "
                        "(raw_* metrics) — in-run EMA A/B")
    p.add_argument("--cfg-options", nargs="*", default=[],
                   help="extra dotted overrides appended to the trainer's")
    args = p.parse_args(argv)

    os.makedirs(args.work_dir, exist_ok=True)
    log_path = os.path.join(args.work_dir, "train.log")
    metrics = os.path.join(args.work_dir, "metrics.jsonl")
    cmd = train_cmd(args)
    print("[rehearsal] " + " ".join(cmd), flush=True)

    t0 = time.time()
    if args.kill_at:
        code, killed = run_leg(cmd, log_path, metrics, kill_at=args.kill_at)
        if not killed:
            print(f"[rehearsal] WARNING: leg 1 exited (code {code}) before "
                  f"the kill point", flush=True)
    code, _ = run_leg(cmd, log_path, metrics)
    if code != 0:
        print(f"[rehearsal] FAIL: trainer exited {code}", flush=True)
        return 1

    if args.kill_at:
        dup, exact = check_resume_bitexact(metrics)
        print(f"[rehearsal] resume overlap: {dup} duplicated steps, "
              f"{exact} bit-exact", flush=True)
        if dup == 0 or exact != dup:
            print("[rehearsal] FAIL: resume not bit-exact", flush=True)
            return 1

    vals = []
    with open(metrics) as f:
        for ln in f:
            try:
                r = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if r.get("mode") == "val":
                vals.append(r)
    print(f"[rehearsal] done in {time.time() - t0:.0f}s; val records:",
          flush=True)
    for v in vals:
        print("  " + json.dumps(v), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
