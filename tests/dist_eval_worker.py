"""Multi-process sharded in-training eval worker (test_distributed.py).

Each process sweeps its round-robin shard of a synthetic WIDER val set
on its own local devices with real yunet_n weights; the packed
detections are all-gathered and process 0 runs the WIDER protocol once
(eval/eval_hook.py). The test asserts the APs are bit-identical to a
single-process run over the same fixture — the process dimension of the
reference's DistEvalHook + multi_gpu_test
(mmdet/apis/test.py:81,179-209, core/evaluation/eval_hooks.py:78-130).

Usage: python dist_eval_worker.py <pid> <nproc> <port> <out.npz> <root>
       (total global devices fixed at 4: nproc processes x 4/nproc local)
"""

import os
import sys

GLOBAL_DEVICES = 4


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    out, root = sys.argv[4], sys.argv[5]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={GLOBAL_DEVICES // nproc}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(f"localhost:{port}",
                                   num_processes=nproc, process_id=pid)
    assert len(jax.devices()) == GLOBAL_DEVICES

    import types

    import numpy as np
    from jax.sharding import Mesh

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from yunet_tpu.config import yunet_n
    from yunet_tpu.eval import make_wider_eval_hook
    from yunet_tpu.utils import load_pth_params

    cfg = yunet_n()
    params, state = load_pth_params(
        "/root/reference/weights/yunet_n.pth")
    ts = types.SimpleNamespace(params=params, state=state, ema_params=None)

    mesh = Mesh(np.array(jax.devices()), ("dp",))
    hook = make_wider_eval_hook(
        cfg, mode=(160, 160),
        ann=os.path.join(root, "val", "labelv2.txt"),
        img_prefix=os.path.join(root, "val", "images"),
        gt_dir=os.path.join(root, "val", "gt"),
        mesh=mesh)
    res = hook(ts, step=0)
    if pid == 0:
        assert res is not None, "process 0 must produce APs"
        np.savez(out, **{k: np.float64(v) for k, v in res.items()})
    else:
        assert res is None, "non-zero processes must not run the matcher"
    print(f"eval worker {pid}/{nproc}: {res}", flush=True)


if __name__ == "__main__":
    main()
