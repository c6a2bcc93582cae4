#!/usr/bin/env python
"""Profile the train step: aggregate device op times from a JAX trace.

Runs a few steps under jax.profiler.trace and prints the top device ops
by total duration (one step's worth, averaged over the traced steps).

Usage: python tools/misc/profile_train_step.py --batch 128 --steps 3
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--max-gts", type=int, default=128)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default="/tmp/yunet_trace")
    ap.add_argument("--device-aug", action="store_true",
                    help="profile the production program: HBM bank + "
                    "MXU resample fused into the step")
    ap.add_argument("--ema", action="store_true",
                    help="include the EMA update (rehearsal config)")
    args = ap.parse_args(argv)

    import dataclasses
    import numpy as np
    import jax

    from yunet_tpu.config import yunet_n
    from yunet_tpu.models import YuNet
    from yunet_tpu.train import init_train_state, make_train_step
    from bench_train_step import make_batch

    from yunet_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()

    cfg = yunet_n()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, img_size=args.img_size,
                                      max_gts=args.max_gts,
                                      device_aug=args.device_aug),
        train=dataclasses.replace(
            cfg.train, ema_momentum=0.0002 if args.ema else 0.0))
    model = YuNet(cfg.model)
    ts, tx = init_train_state(cfg, steps_per_epoch=1000,
                              total_batch=args.batch)
    step = make_train_step(cfg, model, tx, img_size=args.img_size)
    batch = make_batch(np.random.RandomState(0), args.batch, args.img_size,
                       args.max_gts, np.uint8)
    if args.device_aug:
        rng = np.random.RandomState(1)
        import jax.numpy as jnp
        batch.pop("image")
        # match DeviceAugLoader's wire-GT trim (16 slots for the synth
        # set) so the profiled program is the exact rehearsal program
        # (and hits its compilation-cache entry)
        wire = 16
        for k in ("gt_bboxes", "gt_labels", "gt_kps", "gt_valid"):
            batch[k] = batch[k][:, :wire]
        n_imgs = 64
        batch["bank"] = jax.device_put(rng.randint(
            0, 256, (n_imgs, 1152, 1152, 3)).astype(np.uint8))
        batch["aug_idx"] = jnp.asarray(
            rng.randint(0, n_imgs, (args.batch,)).astype(np.int32))
        batch["aug_y0"] = jnp.asarray(
            rng.uniform(0, 200, (args.batch,)).astype(np.float32))
        batch["aug_x0"] = jnp.asarray(
            rng.uniform(0, 200, (args.batch,)).astype(np.float32))
        batch["aug_side"] = jnp.asarray(
            rng.uniform(320, 960, (args.batch,)).astype(np.float32))
        batch["aug_flip"] = jnp.asarray(rng.rand(args.batch) < 0.5)
    ts, m = step(ts, batch)
    jax.block_until_ready(m["loss"])

    # map HLO fusion names -> the interesting ops inside their fused
    # computation, so the trace rows can be categorized
    import re
    hlo = step.lower(ts, batch).compile().as_text()
    # computation header lines look like
    #   %fused_computation.12 (param_0.3: bf16[64]{0:T(256)(128)(2,1)}) -> ... {
    # — parameter types contain nested parens, so take the first token
    # rather than trying to match the parameter list with a regex
    comp_ops = {}
    cur = None
    for line in hlo.splitlines():
        if line and not line.startswith(" ") and "->" in line:
            cur = line.strip().split()[0].lstrip("%")
            comp_ops[cur] = set()
        elif cur:
            for op in ("convolution", "select-and-scatter", "scatter",
                       "reduce-window", "custom-call", "dot", "reduce(",
                       "transpose", "iota"):
                if " " + op in line or "= " + op in line or op + "(" in line:
                    comp_ops[cur].add(op.rstrip("("))
    inst_comp = {}
    for mm in re.finditer(
            r"%?([\w\.\-]+)\s*=\s*[^=]*?\bfusion\(.*?calls=%?([\w\.\-]+)",
            hlo):
        inst_comp[mm.group(1)] = mm.group(2)
    # direct (non-fusion) instructions: map name -> opcode so e.g. a
    # pallas custom-call named %jvp__.1 is not binned as "other"
    inst_op = {}
    opcodes = ("custom-call", "select-and-scatter", "reduce-window",
               "convolution", "scatter", "copy", "fusion", "while",
               "all-reduce", "dot")
    for line in hlo.splitlines():
        m = re.match(r"\s+(?:ROOT\s+)?%?([\w\.\-]+)\s*=\s*", line)
        if not m:
            continue
        for op in opcodes:
            if " " + op + "(" in line:
                inst_op.setdefault(m.group(1), op)
                break

    # instruction -> output bytes (from the HLO result shape), for an
    # implied-bandwidth column: out_bytes/time is a LOWER bound on the
    # op's HBM traffic rate (inputs not counted)
    _dt_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2,
                 "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8,
                 "f64": 8, "s16": 2, "u16": 2}
    # result type is everything between "= " and the opcode token; tuple
    # results and layout annotations both contain parens, so just findall
    # shape atoms in that segment (operand shapes come after the opcode's
    # open-paren, so splitting at the first "(" following the type —
    # i.e. the opcode call — keeps them out)
    inst_bytes = {}
    for line in hlo.splitlines():
        m = re.match(r"\s+(?:ROOT\s+)?%?([\w\.\-]+)\s*=\s*(.*)$", line)
        if not m:
            continue
        name, rest = m.group(1), m.group(2)
        mm = re.search(r"\b[a-z][\w-]*\(", rest)  # opcode call start
        seg = rest[:mm.start()] if mm else rest
        total = 0
        for part in re.finditer(r"(\w+)\[([\d,]*)\]", seg):
            n = 1
            for d in part.group(2).split(","):
                if d:
                    n *= int(d)
            total += n * _dt_bytes.get(part.group(1), 4)
        if total:
            inst_bytes[name] = max(inst_bytes.get(name, 0), total)

    def categorize(name):
        comp = inst_comp.get(name)
        ops = comp_ops.get(comp, set()) if comp else set()
        base = name.split(".")[0]
        op = inst_op.get(name, "")
        if "custom-call" in ops or op == "custom-call" or \
                base in ("custom-call",):
            return "pallas/custom-call"
        if "convolution" in ops or op == "convolution":
            return "conv fusion"
        if "select-and-scatter" in ops or op == "select-and-scatter" or \
                base == "select_and_scatter":
            return "maxpool-bwd (select&scatter)"
        if "scatter" in ops or op == "scatter" or base == "scatter":
            return "scatter"
        if "reduce-window" in ops or op == "reduce-window" or \
                base == "reduce_window":
            return "maxpool-fwd"
        if "dot" in ops or op == "dot":
            return "dot fusion"
        if "reduce" in ops or "reduce" in base or "convert_reduce" in name:
            return "reduce fusion"
        if op == "copy" or base == "copy":
            return "copy/layout"
        if op == "while" or base == "while":
            return "while/serial"
        return "other"

    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            ts, m = step(ts, batch)
        jax.block_until_ready(m["loss"])

    paths = sorted(glob.glob(
        os.path.join(args.out, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        print("no trace found under", args.out)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    # device-lane complete events only (TensorCore pids have "/device:" or
    # "TPU" in the process name); fall back to all X events
    pid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "device" in n.lower()}
    tot = collections.Counter()
    cnt = collections.Counter()
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        tot[name] += ev.get("dur", 0)
        cnt[name] += 1
    # drop container events (the whole-step jit span and bare step ids)
    for k in list(tot):
        if k.startswith("jit_") or k.isdigit():
            del tot[k]
    total_us = sum(tot.values())
    print(f"device total: {total_us / args.steps / 1e3:.2f} ms/step "
          f"({len(tot)} distinct ops)")
    cats = collections.Counter()
    for name, us in tot.items():
        cats[categorize(name)] += us
    print("\nby category:")
    for cat, us in cats.most_common():
        print(f"{us / args.steps / 1e3:9.3f} ms/step  {cat}")
    # implied HBM bandwidth: sum of output bytes per step over device
    # time (a LOWER bound on traffic — inputs are not counted; real
    # traffic is typically 2-3x this)
    total_out_bytes = sum(
        inst_bytes.get(n, 0) * (c // args.steps) for n, c in cnt.items())
    secs = total_us / args.steps / 1e6
    print(f"output-bytes lower bound: {total_out_bytes / 1e9:.1f} GB/step "
          f"-> >= {total_out_bytes / 1e9 / secs:.0f} GB/s achieved "
          f"(v5e HBM peak ~819 GB/s)")

    print("\ntop ops:")
    for name, us in tot.most_common(args.top):
        ob = inst_bytes.get(name, 0)
        bw = ob / (us / args.steps / 1e6) / 1e9 if us else 0.0
        print(f"{us / args.steps / 1e3:9.3f} ms/step  x{cnt[name] // args.steps:<4d}"
              f" {ob / 1e6:8.1f} MB out {bw:6.0f} GB/s"
              f" [{categorize(name)}] {name[:70]}")


if __name__ == "__main__":
    main()
