"""Multi-process SPMD training worker (driven by test_distributed.py).

Runs N steps of the real train step over a global 'dp' mesh that spans
all processes, feeding each process only its contiguous row-shard of a
deterministic global batch (the same split TrainLoader's
process_index/process_count sharding produces), assembled through
device_prefetch's make_array_from_process_local_data path. Process 0
dumps the final parameters; the test asserts they equal a 1-process run
on the identical global batches — the correctness evidence for the
process boundary (reference mmdet/utils/util_distribution.py:34-59,
tools/dist_train.sh).

Usage: python dist_worker.py <pid> <nproc> <port> <out.npz> [f32|bf16]
       (total global devices fixed at 4: nproc processes x 4/nproc local)
"""

import os
import sys

GLOBAL_DEVICES = 4


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    out = sys.argv[4]
    dtype = sys.argv[5] if len(sys.argv) > 5 else "f32"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={GLOBAL_DEVICES // nproc}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(f"localhost:{port}",
                                   num_processes=nproc, process_id=pid)
    assert len(jax.devices()) == GLOBAL_DEVICES

    import dataclasses
    import numpy as np
    from jax.sharding import Mesh

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from yunet_tpu.config import yunet_n
    from yunet_tpu.data.loader import device_prefetch
    from yunet_tpu.models import YuNet
    from yunet_tpu.parallel.mesh import batch_sharding
    from yunet_tpu.train import init_train_state, make_train_step

    img, g, steps = 64, 4, 3  # small program: cuts compile-time skew
    cfg = yunet_n()
    # f32 trunk (default): this worker gates the PROCESS boundary (shard
    # assembly + cross-host collectives), so the gate must stay bit-tight.
    # In bf16, the ~1e-7 cross-host psum reduction-order noise on the
    # first BN's batch stats is amplified ~100-1000x by twelve bf16
    # renormalization roundings (measured round 4: 1.2e-7 rel at
    # model0.bn1.mean -> 4.4e-5 rel on the step-1 loss — in BOTH composed
    # and factored modes), which swamps a tight gate without indicating
    # any collective bug. f32 keeps the amplification linear (~1e-7 stays
    # ~1e-7). The production bf16 configuration's cross-process path is
    # exercised end-to-end by the bf16 worker leg, gated at a tolerance
    # band instead (test_distributed.py).
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, img_size=img, max_gts=g),
        train=dataclasses.replace(cfg.train, bf16=(dtype == "bf16")))
    model = YuNet(cfg.model)
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    b = 2 * GLOBAL_DEVICES  # global batch
    lb = b // nproc         # per-process rows
    ts, tx = init_train_state(cfg, steps_per_epoch=10, total_batch=b)
    step = make_train_step(cfg, model, tx, img_size=img, mesh=mesh)

    def global_batch(i):
        rng = np.random.RandomState(100 + i)
        c = rng.uniform(20, img - 20, (b, g, 2)).astype(np.float32)
        wh = rng.uniform(8, 40, (b, g, 2)).astype(np.float32)
        kps = np.concatenate(
            [rng.uniform(10, img - 10, (b, g, 5, 2)).astype(np.float32),
             np.ones((b, g, 5, 1), np.float32)], -1)
        return {
            "image": rng.randint(0, 256, (b, img, img, 3)).astype(
                np.float32),
            "gt_bboxes": np.concatenate([c - wh / 2, c + wh / 2], -1),
            "gt_labels": np.zeros((b, g), np.int32),
            "gt_kps": kps,
            "gt_valid": np.tile(np.arange(g) < 4, (b, 1)),
        }

    def local_batches():
        for i in range(steps):
            gb = global_batch(i)
            yield {k: v[pid * lb:(pid + 1) * lb] for k, v in gb.items()}

    losses = []
    step_exec = step
    for n_step, batch in enumerate(device_prefetch(
            local_batches(), sharding=batch_sharding(mesh))):
        if n_step == 0 and nproc > 1:
            # compile, then align processes, then dispatch — the first
            # collective's rendezvous deadline can't absorb compile skew
            from jax.experimental import multihost_utils
            step_exec = step.lower(ts, batch).compile()
            multihost_utils.sync_global_devices("step_compiled")
        ts, m = step_exec(ts, batch)
        losses.append(float(m["loss"]))

    if pid == 0:
        flat = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                ts.params)[0]:
            flat[jax.tree_util.keystr(path)] = np.asarray(leaf)
        flat["__losses__"] = np.asarray(losses)
        np.savez(out, **flat)
    print(f"worker {pid}/{nproc}: losses {losses}", flush=True)


if __name__ == "__main__":
    main()
