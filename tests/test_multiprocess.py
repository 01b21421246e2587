"""REAL two-process multi-host execution (VERDICT r4 item 2).

Spawns two `jax.distributed`-initialized CPU processes (4 virtual devices
each) forming one global 8-device data mesh, runs host-fed GAN steps plus a
resident-store burst through the ACTUAL multi-process code path
(process-local batch assembly via ``shard_local_batch``, replicated state
via ``replicate_tree``, gloo cross-process collectives), and asserts the
training logs are identical across the two processes AND equal to a
single-process 8-device run of the same global batches (this pytest process
is that run — conftest sets up 8 virtual devices)."""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # real two-process jax.distributed runs

REPO = os.path.join(os.path.dirname(__file__), "..")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_process_logs():
    port = _free_port()
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)  # worker sets jax_num_cpu_devices itself
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multiprocess_worker.py"),
             "--coord", f"localhost:{port}", "--num-procs", "2",
             "--proc-id", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out[-4000:]}"
    logs = []
    for _, out in outs:
        line = [l for l in out.splitlines() if l.startswith("LOGS ")]
        assert line, f"no LOGS line in worker output:\n{out[-4000:]}"
        logs.append(json.loads(line[-1][5:]))
    return logs


def test_two_process_logs_agree(two_process_logs):
    l0, l1 = two_process_logs
    assert l0 == l1  # bitwise-identical SPMD across the two processes
    for step in l0:
        assert all(np.isfinite(v) for v in step.values())


def test_two_process_matches_single_process(two_process_logs):
    """The same global batches through THIS process's 8-device mesh produce
    the same training trajectory. Equality is approximate: the cross-process
    gloo psum reduces in a different order than the single-process one, so
    low-order-bit rounding differences compound per step (measured ~2e-4
    relative after two steps + a burst); threefry noise and sampling are
    bitwise-invariant."""
    from esrganplus_tpu.data.resident import ResidentCropStore
    from esrganplus_tpu.parallel import make_mesh, shard_local_batch
    from esrganplus_tpu.train.gan_model import GANTrainer
    from tests.multiprocess_common import (
        GAN_CFG, NET_D, NET_G, SEED_BATCHES, make_tiny_dataset,
        run_logs_to_jsonable,
    )

    mesh = make_mesh(data=8, devices=jax.devices()[:8])
    trainer = GANTrainer(NET_G, NET_D, GAN_CFG, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ref = []
    for step, batch_np in enumerate(SEED_BATCHES()):
        batch = shard_local_batch(mesh, batch_np)
        state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(step))
        ref.append(run_logs_to_jsonable(logs))
    with make_tiny_dataset() as dataset:
        store = ResidentCropStore(dataset, mesh, n_crops=16, refresh_steps=0,
                                  seed=0)
        state, rlogs = trainer.train_step_resident(
            state, store, jax.random.PRNGKey(99), batch_size=8, n_steps=2)
    ref.append(run_logs_to_jsonable(rlogs))

    mp = two_process_logs[0]
    assert len(mp) == len(ref)
    for got, want in zip(mp, ref):
        assert got.keys() == want.keys()
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=5e-3, atol=1e-5,
                                       err_msg=k)


def test_cli_train_two_process(tmp_path):
    """The training CLI's --dist-* flags drive a real two-process run end to
    end: jax.distributed init, host-interleaved loaders feeding process-local
    batches, replicated state, lead-only validation/checkpointing. Both
    processes must exit 0; the lead must have produced the checkpoint, the
    exported .pth, val images, and the rank-1 log must exist without any
    checkpoint writes racing it."""
    import json as _json

    from esrganplus_tpu.ops.image_io import save_img
    from esrganplus_tpu.ops.resize import imresize_np

    root = str(tmp_path)
    hr_dir, lr_dir = os.path.join(root, "HR"), os.path.join(root, "LR")
    rng = np.random.RandomState(5)
    for i in range(4):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        save_img(img, os.path.join(hr_dir, f"img{i}.png"))
        lr = np.clip(imresize_np(img.astype(np.float32) / 255.0, 0.25), 0, 1)
        save_img((lr * 255).round().astype(np.uint8),
                 os.path.join(lr_dir, f"img{i}.png"))

    opt = {
        "name": "mp_cli", "model": "sr", "scale": 4, "use_tb_logger": False,
        "datasets": {"train": {
            "name": "t", "mode": "LRHR", "dataroot_HR": hr_dir,
            "dataroot_LR": lr_dir, "n_workers": 1, "batch_size": 4,
            "HR_size": 32, "use_flip": False, "use_rot": False,
        }, "val": {"name": "v", "mode": "LRHR", "dataroot_HR": hr_dir,
                   "dataroot_LR": lr_dir}},
        "path": {"root": root},
        "network_G": {"which_model_G": "RRDB_net", "norm_type": None,
                      "mode": "CNA", "nf": 8, "nb": 1, "in_nc": 3,
                      "out_nc": 3, "gc": 4},
        "train": {"lr_G": 1e-3, "lr_scheme": "MultiStepLR",
                  "lr_steps": [1000], "lr_gamma": 0.5,
                  "pixel_criterion": "l1", "pixel_weight": 1.0,
                  "manual_seed": 0, "niter": 4, "val_freq": 2,
                  "save_checkpoint_freq": 4},
        "logger": {"print_freq": 2},
    }
    opt_path = os.path.join(root, "opt.json")
    _json.dump(opt, open(opt_path, "w"))

    port = _free_port()
    env = {**os.environ}
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "cli_train_worker.py"),
             "-opt", opt_path, "--dist-coordinator", f"localhost:{port}",
             "--dist-num-processes", "2", "--dist-process-id", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, f"CLI worker failed (rc={rc}):\n{out[-4000:]}"

    exp = os.path.join(root, "experiments", "mp_cli")
    assert os.path.exists(os.path.join(exp, "training_state", "4.state.npz"))
    assert os.path.exists(os.path.join(exp, "models", "latest_G.pth"))
    logs = os.listdir(exp)
    assert any(f.startswith("train_rank1") and f.endswith(".log") for f in logs)
    lead_log = [f for f in logs if f.endswith(".log")
                and not f.startswith("train_rank")]
    text = open(os.path.join(exp, lead_log[0])).read()
    assert "Validation # PSNR" in text
    assert len(os.listdir(os.path.join(exp, "val_images"))) == 4
