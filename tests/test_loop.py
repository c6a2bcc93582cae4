"""Training-loop integration: fit() end-to-end on synthetic data,
checkpoint + auto-resume, metrics JSONL."""

import dataclasses
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from yunet_tpu.config import yunet_n


def _tiny_cfg():
    cfg = yunet_n()
    return dataclasses.replace(
        cfg,
        model=cfg.model,
        data=dataclasses.replace(cfg.data, img_size=96, max_gts=8,
                                 samples_per_device=2),
        train=dataclasses.replace(cfg.train, bf16=False, log_interval=2,
                                  checkpoint_interval=1))


def test_fit_and_auto_resume(tmp_path):
    from smoke_data import SyntheticLoader
    from yunet_tpu.train.loop import fit

    cfg = _tiny_cfg()
    loader = SyntheticLoader(cfg, batch_size=2)
    loader.steps_per_epoch = 4
    ts = fit(cfg, work_dir=str(tmp_path), max_steps=4, loader=loader)
    assert int(ts.step) == 4
    assert os.path.exists(tmp_path / "latest")
    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl") if l.strip()]
    assert any(r["mode"] == "train" and np.isfinite(r["loss"])
               for r in lines)

    # resume continues from step 4
    loader2 = SyntheticLoader(cfg, batch_size=2)
    loader2.steps_per_epoch = 4
    evals = []

    def eval_hook(state, step):
        evals.append(step)
        return {"mAP": 0.5}

    ts2 = fit(cfg, work_dir=str(tmp_path), auto_resume=True,
              max_steps=8, loader=loader2, eval_hook=eval_hook,
              eval_interval_epochs=1)
    assert int(ts2.step) == 8
    assert evals == [8]


def test_fit_raises_on_nan(tmp_path):
    from smoke_data import SyntheticLoader
    from yunet_tpu.train.loop import fit

    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, lr=1e10,
                                       warmup_iters=0, bf16=False,
                                       log_interval=1))
    loader = SyntheticLoader(cfg, batch_size=2)
    loader.steps_per_epoch = 100
    with pytest.raises(FloatingPointError):
        fit(cfg, work_dir=str(tmp_path / "nan"), max_steps=6,
            loader=loader)
