#!/usr/bin/env python
"""Export the hard-tier band-gate fixture (tests/test_hard_band.py).

Loads the dress-rehearsal endpoint checkpoint (EMA parameters when the
checkpoint carries them), runs the mode-0 (640x640 letterbox) AND the
mode-2 (origin-size, the reference's headline protocol —
/root/reference/tools/test_widerface.py:84-96) WIDER protocols over the
hard val split to record the reference APs, and writes everything the
gate needs into one npz: flat param/state leaves (tree_flatten order) +
a JSON meta record.

  python tools/misc/export_band_fixture.py \
      --ckpt work_dirs/rehearsal_r05/ckpt_XXXX \
      --data data/synth_wider_hard --out tests/fixtures/r05_band.npz
"""

import argparse
import dataclasses
import json
import os
import sys
import types

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", default="work_dirs/rehearsal_r04/ckpt_00002400")
    p.add_argument("--data", default="data/synth_wider_hard")
    p.add_argument("--config", default="yunet_n")
    p.add_argument("--out", default="tests/fixtures/r04_ema.npz")
    p.add_argument("--tier", default="hard",
                   help="generator tier the val split was built with "
                   "(embedded in meta so tests/test_hard_band.py "
                   "regenerates the SAME split)")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")

    from yunet_tpu.config import get_config
    from yunet_tpu.eval.eval_hook import make_wider_eval_hook
    from yunet_tpu.train.checkpoint import load_checkpoint
    from yunet_tpu.train.step import init_train_state

    cfg = get_config(args.config)
    val = os.path.join(args.data, "val")
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data,
        val_ann=os.path.join(val, "labelv2.txt"),
        val_img_prefix=os.path.join(val, "images"),
        gt_dir=os.path.join(val, "gt")))

    # template with EMA leaves so the checkpoint's shadow restores
    cfg_ema = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ema_momentum=0.0002))
    ts, _ = init_train_state(cfg_ema, steps_per_epoch=1, total_batch=1)
    ts, meta = load_checkpoint(os.path.abspath(args.ckpt), ts)
    params = ts.ema_params if ts.ema_params is not None else ts.params
    step = int(meta.get("step", -1))
    print(f"checkpoint {args.ckpt} (step {step}, EMA params)")

    fake_ts = types.SimpleNamespace(params=params, ema_params=None,
                                    state=ts.state)
    hook = make_wider_eval_hook(cfg, mode=(640, 640), use_ema=False)
    aps = hook(fake_ts, step=step)
    print(f"mode-0 APs on {val}: {aps}")
    hook2 = make_wider_eval_hook(cfg, mode="ORIGIN", use_ema=False)
    aps2 = hook2(fake_ts, step=step)
    print(f"mode-2 (origin-size) APs on {val}: {aps2}")

    pleaves = jax.tree_util.tree_leaves(params)
    sleaves = jax.tree_util.tree_leaves(ts.state)
    blob = {f"p{i}": np.asarray(l, np.float32)
            for i, l in enumerate(pleaves)}
    blob.update({f"s{i}": np.asarray(l, np.float32)
                 for i, l in enumerate(sleaves)})
    # embed the generator geometry so the band gate regenerates the
    # SAME val split the APs were recorded on (count the '# path' image
    # header lines of the labelv2 the hook just evaluated)
    with open(cfg.data.val_ann) as f:
        val_n = sum(1 for ln in f if ln.startswith("#"))
    blob["meta"] = json.dumps({
        "step": step, "ckpt": args.ckpt, "data": args.data,
        "n_params": len(pleaves), "n_state": len(sleaves),
        "val_n": val_n, "tier": args.tier,
        "mode0_aps": aps, "mode2_aps": aps2})
    d = os.path.dirname(args.out)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez_compressed(args.out, **blob)
    print(f"wrote {args.out} "
          f"({os.path.getsize(args.out) / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
