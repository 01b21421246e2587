"""Worker for the REAL two-process multi-host test (SURVEY §2.9).

Each process owns 4 virtual CPU devices of a global 8-device data mesh:
``jax.distributed.initialize`` + gloo CPU collectives execute the actual
multi-process code path (process-local device counts, cross-process psum)
that a TPU pod slice would use — no hardware needed.

Run (spawned by tests/test_multiprocess.py, 2 processes):

    python tests/multiprocess_worker.py --coord localhost:<port> \
        --num-procs 2 --proc-id <i>

Prints one line per check: ``LOGS <json>`` with the per-step training logs
(identical across processes, and equal to a single-process 8-device run of
the same global batches).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", required=True)
    ap.add_argument("--num-procs", type=int, required=True)
    ap.add_argument("--proc-id", type=int, required=True)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices_per_proc)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=args.coord,
                               num_processes=args.num_procs,
                               process_id=args.proc_id)

    import numpy as np

    from esrganplus_tpu.data.resident import ResidentCropStore
    from esrganplus_tpu.models.discriminator import DiscriminatorVGGConfig
    from esrganplus_tpu.models.rrdb import RRDBNetConfig
    from esrganplus_tpu.parallel import make_mesh, shard_local_batch
    from esrganplus_tpu.train.gan_model import GANTrainConfig, GANTrainer
    from tests.multiprocess_common import (
        GAN_CFG, NET_D, NET_G, SEED_BATCHES, make_tiny_dataset, run_logs_to_jsonable,
    )

    assert jax.process_count() == args.num_procs
    assert len(jax.devices()) == args.num_procs * args.devices_per_proc
    assert len(jax.local_devices()) == args.devices_per_proc

    mesh = make_mesh()  # all 8 global devices on the data axis
    trainer = GANTrainer(NET_G, NET_D, GAN_CFG, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))

    # ---- host-fed GAN steps: each process feeds its LOCAL half of the
    # global batch (loader host-interleave order: host-major) ----
    logs_out = []
    for step, (lr_np, hr_np) in enumerate(SEED_BATCHES()):
        n_local = lr_np.shape[0] // args.num_procs
        lo = args.proc_id * n_local
        local = (lr_np[lo:lo + n_local], hr_np[lo:lo + n_local])
        batch = shard_local_batch(mesh, local)
        state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(step))
        logs_out.append(run_logs_to_jsonable(logs))

    # ---- resident burst: identical seeded pools on every process,
    # replicated upload, 2 fused steps in one dispatch ----
    with make_tiny_dataset() as dataset:
        store = ResidentCropStore(dataset, mesh, n_crops=16, refresh_steps=0,
                                  seed=0)
        state, rlogs = trainer.train_step_resident(
            state, store, jax.random.PRNGKey(99), batch_size=8, n_steps=2)
    logs_out.append(run_logs_to_jsonable(rlogs))

    print("LOGS " + json.dumps(logs_out), flush=True)


if __name__ == "__main__":
    main()
