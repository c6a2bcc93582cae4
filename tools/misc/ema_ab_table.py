"""Render the EMA-vs-raw AP table from a rehearsal metrics.jsonl.

The EMA on/off A/B (VERDICT r4 #4) runs as ONE training run: with
``tools/train.py --eval-both-params`` every in-training eval scores both
the EMA shadow and the raw optimizer params. Because the EMA shadow
never feeds back into the update (reference core/hook/ema.py swaps
params only around eval/checkpoint, never into the optimizer), the raw
columns ARE the no-EMA trajectory — same batches, same seeds, zero
confounds, strictly tighter than two separate runs.

Usage:
  python tools/misc/ema_ab_table.py work_dirs/rehearsal_r05/metrics.jsonl
"""

from __future__ import annotations

import argparse
import json
import sys


def load_val_records(path: str):
    recs = []
    with open(path) as f:
        for ln in f:
            try:
                r = json.loads(ln)
            except json.JSONDecodeError:
                continue  # truncated line from a killed run
            if r.get("mode") == "val" and "raw_hard" in r:
                recs.append(r)
    # auto-resume replays steps; keep the LAST record per step
    by_step = {r["step"]: r for r in recs}
    return [by_step[s] for s in sorted(by_step)]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("metrics", help="metrics.jsonl with --eval-both-params "
                    "val records")
    ap.add_argument("--markdown", action="store_true",
                    help="emit a GitHub-markdown table")
    args = ap.parse_args(argv)

    recs = load_val_records(args.metrics)
    if not recs:
        print("no --eval-both-params val records found", file=sys.stderr)
        return 1

    sep = " | " if args.markdown else "  "
    edge = "| " if args.markdown else ""
    cols = ["step", "EMA easy", "EMA med", "EMA hard",
            "raw easy", "raw med", "raw hard", "hard Δ(EMA-raw)"]
    print(edge + sep.join(cols) + (" |" if args.markdown else ""))
    if args.markdown:
        print("|" + "|".join(["---"] * len(cols)) + "|")
    for r in recs:
        row = [str(r["step"])] + [
            f"{r[k]:.4f}" for k in ("easy", "medium", "hard",
                                    "raw_easy", "raw_medium", "raw_hard")
        ] + [f"{r['hard'] - r['raw_hard']:+.4f}"]
        print(edge + sep.join(row) + (" |" if args.markdown else ""))

    last = recs[-1]
    d = last["hard"] - last["raw_hard"]
    winner = "EMA" if d > 0 else "raw (no-EMA)"
    print(f"\nendpoint (step {last['step']}): hard EMA {last['hard']:.4f} "
          f"vs raw {last['raw_hard']:.4f} -> {winner} by {abs(d):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
