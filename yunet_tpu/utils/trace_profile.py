"""Shared machinery for profiling compiled programs from a JAX trace.

Used by tools/misc/profile_train_step.py and profile_serve.py: parse the
program's HLO to map instruction names to op categories and output
bytes, aggregate the device lanes of a ``jax.profiler.trace``, and print
a per-category / per-op table with an implied-bandwidth column.

The output-bytes column is a LOWER bound on each op's HBM traffic
(operand reads are not counted), so out_bytes/time under-reports the
achieved bandwidth by the fan-in factor (typically 2-3x).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
from typing import Counter, Dict, Set, Tuple

_DT_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2,
             "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8,
             "f64": 8, "s16": 2, "u16": 2}

_OPCODES = ("custom-call", "select-and-scatter", "reduce-window",
            "convolution", "scatter", "copy", "fusion", "while",
            "all-reduce", "dot")


class HloMaps:
    """Instruction-name lookup tables parsed from compiled HLO text."""

    def __init__(self, hlo: str):
        # computation -> interesting ops inside its fused body.
        # Header lines look like
        #   %fused_computation.12 (param_0.3: bf16[64]{...}) -> ... {
        # parameter types contain nested parens, so take the first token
        # rather than matching the parameter list with a regex.
        self.comp_ops: Dict[str, Set[str]] = {}
        cur = None
        for line in hlo.splitlines():
            if line and not line.startswith(" ") and "->" in line:
                cur = line.strip().split()[0].lstrip("%")
                self.comp_ops[cur] = set()
            elif cur:
                for op in ("convolution", "select-and-scatter", "scatter",
                           "reduce-window", "custom-call", "dot", "reduce(",
                           "transpose", "iota"):
                    if " " + op in line or "= " + op in line \
                            or op + "(" in line:
                        self.comp_ops[cur].add(op.rstrip("("))

        # fusion instruction -> called computation
        self.inst_comp: Dict[str, str] = {}
        for mm in re.finditer(
                r"%?([\w\.\-]+)\s*=\s*[^=]*?\bfusion\(.*?calls=%?([\w\.\-]+)",
                hlo):
            self.inst_comp[mm.group(1)] = mm.group(2)

        # direct (non-fusion) instruction -> opcode, so e.g. a pallas
        # custom-call named %jvp__.1 is not binned as "other"
        self.inst_op: Dict[str, str] = {}
        # instruction -> result bytes. The result type is everything
        # between "= " and the opcode token; tuple results and layout
        # annotations both contain parens, so findall shape atoms in
        # that segment (operand shapes come after the opcode's
        # open-paren, so cutting at the opcode call keeps them out).
        self.inst_bytes: Dict[str, int] = {}
        for line in hlo.splitlines():
            m = re.match(r"\s+(?:ROOT\s+)?%?([\w\.\-]+)\s*=\s*(.*)$", line)
            if not m:
                continue
            name, rest = m.group(1), m.group(2)
            for op in _OPCODES:
                if " " + op + "(" in rest:
                    self.inst_op.setdefault(name, op)
                    break
            mm = re.search(r"\b[a-z][\w-]*\(", rest)  # opcode call start
            seg = rest[:mm.start()] if mm else rest
            total = 0
            for part in re.finditer(r"(\w+)\[([\d,]*)\]", seg):
                n = 1
                for d in part.group(2).split(","):
                    if d:
                        n *= int(d)
                total += n * _DT_BYTES.get(part.group(1), 4)
            if total:
                self.inst_bytes[name] = max(
                    self.inst_bytes.get(name, 0), total)

    def categorize(self, name: str) -> str:
        comp = self.inst_comp.get(name)
        ops = self.comp_ops.get(comp, set()) if comp else set()
        base = name.split(".")[0]
        op = self.inst_op.get(name, "")
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


def aggregate_trace(out_dir: str
                    ) -> Tuple[Counter[str], Counter[str]]:
    """Sum device-lane complete-event durations (us) and counts by op
    name from the newest trace under ``out_dir``."""
    paths = sorted(glob.glob(
        os.path.join(out_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace found under {out_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    pid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "device" in n.lower()}
    tot: Counter[str] = collections.Counter()
    cnt: Counter[str] = collections.Counter()
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
    return tot, cnt


def report(maps: HloMaps, tot: Counter[str], cnt: Counter[str],
           steps: int, top: int = 30) -> None:
    total_us = sum(tot.values())
    print(f"device total: {total_us / steps / 1e3:.2f} ms/step "
          f"({len(tot)} distinct ops)")
    cats: Counter[str] = collections.Counter()
    for name, us in tot.items():
        cats[maps.categorize(name)] += us
    print("\nby category:")
    for cat, us in cats.most_common():
        print(f"{us / steps / 1e3:9.3f} ms/step  {cat}")
    total_out_bytes = sum(
        maps.inst_bytes.get(n, 0) * (c // steps) for n, c in cnt.items())
    secs = total_us / steps / 1e6
    if secs:
        print(f"output-bytes lower bound: {total_out_bytes / 1e9:.1f} "
              f"GB/step -> >= {total_out_bytes / 1e9 / secs:.0f} GB/s "
              f"achieved (v5e HBM peak ~819 GB/s)")
    print("\ntop ops:")
    for name, us in tot.most_common(top):
        ob = maps.inst_bytes.get(name, 0)
        bw = ob / (us / steps / 1e6) / 1e9 if us else 0.0
        print(f"{us / steps / 1e3:9.3f} ms/step  "
              f"x{cnt[name] // steps:<4d}"
              f" {ob / 1e6:8.1f} MB out {bw:6.0f} GB/s"
              f" [{maps.categorize(name)}] {name[:70]}")
