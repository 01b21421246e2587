"""Device-resident crop store: pool building, on-device sampling/augment
parity with the host pipeline, trainer integration, CLI e2e."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrganplus_tpu.data.datasets import LRHRDataset
from esrganplus_tpu.data.resident import ResidentCropStore, build_crop_pool
from esrganplus_tpu.ops.image_io import save_img
from esrganplus_tpu.ops.resize import imresize_np
from esrganplus_tpu.parallel import make_mesh


def _make_dataset(root, n=4, hr=32, scale=4, hr_size=16):
    hr_dir = os.path.join(root, "HR")
    lr_dir = os.path.join(root, "LR")
    rng = np.random.RandomState(7)
    for i in range(n):
        img = (rng.rand(hr, hr, 3) * 255).astype(np.uint8)
        save_img(img, os.path.join(hr_dir, f"img{i}.png"))
        lr = np.clip(imresize_np(img.astype(np.float32) / 255.0, 1.0 / scale), 0, 1)
        save_img((lr * 255).round().astype(np.uint8),
                 os.path.join(lr_dir, f"img{i}.png"))
    return LRHRDataset({
        "phase": "train", "dataroot_HR": hr_dir, "dataroot_LR": lr_dir,
        "scale": scale, "HR_size": hr_size, "use_flip": True, "use_rot": True,
    })


def test_build_crop_pool_shapes_and_alignment(tmp_path):
    ds = _make_dataset(str(tmp_path))
    lr, hr = build_crop_pool(ds, 8, np.random.RandomState(0))
    assert lr.shape == (8, 4, 4, 3) and lr.dtype == np.uint8
    assert hr.shape == (8, 16, 16, 3) and hr.dtype == np.uint8
    # host augment flags restored after building
    assert ds.opt["use_flip"] is True and ds.opt["use_rot"] is True


def test_resident_sampler_matches_host_gather(tmp_path):
    # flips off: the sampled batch must equal a host gather of the pool
    # (uint8 → f32/255) bit-for-bit, with identical LR/HR indices.
    ds = _make_dataset(str(tmp_path))
    mesh = make_mesh()
    store = ResidentCropStore(ds, mesh, n_crops=16, refresh_steps=0, seed=0,
                              use_flip=False, use_rot=False)
    sample = store.make_sampler(batch_size=8)
    key = jax.random.PRNGKey(5)
    lr, hr = jax.jit(sample)(key, store.lr, store.hr)
    kidx = jax.random.split(key)[0]
    idx = np.asarray(jax.random.randint(kidx, (8,), 0, 16))
    # 1-ulp tolerance: XLA compiles /255 as multiply-by-reciprocal
    np.testing.assert_allclose(
        np.asarray(lr), np.asarray(store.lr)[idx].astype(np.float32) / 255.0,
        atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(hr), np.asarray(store.hr)[idx].astype(np.float32) / 255.0,
        atol=1e-7)


def test_resident_sampler_augment_pairs(tmp_path):
    # flips on: every sampled pair must be one of the 8 dihedral transforms
    # of some pool pair, with the SAME transform applied to LR and HR
    # (_paired_augment parity: hflip, vflip, transpose).
    ds = _make_dataset(str(tmp_path))
    mesh = make_mesh()
    store = ResidentCropStore(ds, mesh, n_crops=6, refresh_steps=0, seed=0)
    sample = store.make_sampler(batch_size=16)
    lr, hr = jax.jit(sample)(jax.random.PRNGKey(9), store.lr, store.hr)
    lr, hr = np.asarray(lr), np.asarray(hr)
    pool_lr = np.asarray(store.lr).astype(np.float32) / 255.0
    pool_hr = np.asarray(store.hr).astype(np.float32) / 255.0

    def variants(img):
        for do_h in (False, True):
            for do_v in (False, True):
                for do_r in (False, True):
                    v = img
                    if do_h:
                        v = v[:, ::-1]
                    if do_v:
                        v = v[::-1]
                    if do_r:
                        v = v.transpose(1, 0, 2)
                    yield (do_h, do_v, do_r), v

    def eq(a, b):  # 1-ulp tolerance (reciprocal-multiply /255)
        return np.abs(a - b).max() < 1e-7

    for b in range(16):
        found = False
        for i in range(6):
            for t, v_hr in variants(pool_hr[i]):
                if eq(hr[b], v_hr):
                    v_lr = dict(variants(pool_lr[i]))[t]
                    assert eq(lr[b], v_lr), (b, i, t)
                    found = True
        assert found, f"sample {b} is not a transform of any pool pair"


def test_train_step_resident_runs_on_mesh(tmp_path):
    from esrganplus_tpu.models.rrdb import RRDBNetConfig
    from esrganplus_tpu.train.sr_model import SRTrainer, SRTrainConfig

    ds = _make_dataset(str(tmp_path))
    mesh = make_mesh()  # 8 virtual CPU devices under pytest
    tr = SRTrainer(RRDBNetConfig(nf=8, nb=1, gc=4, upscale=4),
                   SRTrainConfig(), mesh=mesh)
    store = ResidentCropStore(ds, mesh, n_crops=16, refresh_steps=0, seed=0)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    for _ in range(2):
        state, logs = tr.train_step_resident(state, store, rng, batch_size=8)
    assert np.isfinite(float(logs["l_pix"]))
    assert int(state["step"]) == 2
    # refresh re-uploads without changing shapes
    store.refresh_steps = 1
    store.maybe_refresh(1)
    state, logs = tr.train_step_resident(state, store, rng, batch_size=8)
    assert np.isfinite(float(logs["l_pix"]))


def test_resident_burst_equals_single_steps(tmp_path):
    # train_step_resident(n_steps=2) must reproduce two single calls exactly:
    # both fold the same base rng by state["step"], so the per-step key
    # sequences are identical and the fori_loop burst is pure batching.
    from esrganplus_tpu.models.rrdb import RRDBNetConfig
    from esrganplus_tpu.train.sr_model import SRTrainer, SRTrainConfig

    ds = _make_dataset(str(tmp_path))
    mesh = make_mesh()
    tr = SRTrainer(RRDBNetConfig(nf=8, nb=1, gc=4, upscale=4),
                   SRTrainConfig(), mesh=mesh)
    store = ResidentCropStore(ds, mesh, n_crops=16, refresh_steps=0, seed=0)
    rng = jax.random.PRNGKey(1)

    s1 = tr.init_state(jax.random.PRNGKey(0))
    for _ in range(2):
        s1, logs1 = tr.train_step_resident(s1, store, rng, batch_size=8)
    s2 = tr.init_state(jax.random.PRNGKey(0))
    s2, logs2 = tr.train_step_resident(s2, store, rng, batch_size=8,
                                       n_steps=2)
    assert int(s2["step"]) == 2
    # same key schedule → same math; tolerate compilation-variant rounding
    # (the fori body fuses slightly differently than the standalone step)
    assert abs(float(logs1["l_pix"]) - float(logs2["l_pix"])) < 1e-6
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=1e-10)


def test_gan_train_step_resident_runs(tmp_path):
    from esrganplus_tpu.models.discriminator import DiscriminatorVGGConfig
    from esrganplus_tpu.models.rrdb import RRDBNetConfig
    from esrganplus_tpu.train.gan_model import GANTrainer, GANTrainConfig

    ds = _make_dataset(str(tmp_path), hr=128, hr_size=96)
    mesh = make_mesh()
    tr = GANTrainer(RRDBNetConfig(nf=8, nb=1, gc=4, upscale=4),
                    DiscriminatorVGGConfig(input_size=96, base_nf=8),
                    GANTrainConfig(feature_weight=0.0), mesh=mesh)
    store = ResidentCropStore(ds, mesh, n_crops=16, refresh_steps=0, seed=0)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    for _ in range(2):
        state, logs = tr.train_step_resident(state, store, rng, batch_size=8)
    assert np.isfinite(float(logs["l_d_total"]))
    assert int(state["step"]) == 2


def test_compute_burst_len_boundaries():
    from esrganplus_tpu.cli.train import compute_burst_len

    f = lambda step, **kw: compute_burst_len(
        step, kw.get("burst", 8), kw.get("niter", 1000),
        kw.get("freqs", (100, 0, None)), kw.get("prof", (None, None)))
    assert f(0) == 8                      # clean burst
    assert f(96) == 1                     # print boundary at 100 → remainder
    assert f(992, niter=996) == 1         # niter cut
    assert f(992, niter=1000) == 8        # exactly fits
    assert f(0, freqs=(4,)) == 1          # freq shorter than burst
    assert f(0, prof=(10, 30)) == 8       # [0,8) ends before the start at 10
    assert f(8, prof=(10, 30)) == 1       # would cross the start → remainder
    assert f(24, prof=(10, 30), freqs=()) == 1   # would cross the stop at 30
    assert f(32, prof=(10, 30), freqs=()) == 8   # past the window
    # a full burst never crosses any boundary
    for step in range(0, 200):
        n = compute_burst_len(step, 8, 200, (50, 20), (60, 70))
        assert n in (1, 8)
        for b in (50, 20):
            assert (step % b) + n <= b or n == 1 or (step % b) + n <= b
        end = step + n
        for b in (50, 20):
            lo = (step // b) * b + b
            assert end <= lo or step >= lo
        for p in (60, 70):
            assert not (step < p < end)


@pytest.mark.slow
def test_sftgan_resident_store_and_step(tmp_path):
    import torch

    from esrganplus_tpu.data.resident import ResidentSegStore, build_seg_crop_pool
    from esrganplus_tpu.data.seg_dataset import LRHRSegBGDataset
    from esrganplus_tpu.models.sft import SFTNetConfig
    from esrganplus_tpu.train.sftgan_model import SFTGANTrainConfig, SFTGANTrainer

    img_dir = os.path.join(str(tmp_path), "img")
    seg_dir = os.path.join(str(tmp_path), "bicseg")
    os.makedirs(seg_dir)
    rng = np.random.RandomState(5)
    for i in range(3):
        img = (rng.rand(128, 128, 3) * 255).astype(np.uint8)
        save_img(img, os.path.join(img_dir, f"0{i+1}_a.png"))
        onehot = np.zeros((8, 128, 128), np.float32)
        onehot[(i + 1) % 8] = 1.0
        torch.save(torch.from_numpy(onehot),
                   os.path.join(seg_dir, f"0{i+1}_a.pth"))
    ds = LRHRSegBGDataset({
        "phase": "train", "dataroot_HR": img_dir, "scale": 4, "HR_size": 96,
        "use_flip": True, "use_rot": True,
    })
    lr, seg, hr, cat = build_seg_crop_pool(ds, 6, np.random.RandomState(0))
    assert lr.shape == (6, 24, 24, 3) and lr.dtype == np.float32
    assert seg.shape == (6, 96, 96, 8) and seg.dtype == np.uint8
    assert hr.shape == (6, 96, 96, 3) and hr.dtype == np.uint8
    assert set(np.unique(seg)) <= {0, 255}  # one-hot survives storage
    assert cat.dtype == np.int32 and (cat >= 0).all()

    mesh = make_mesh()
    store = ResidentSegStore(ds, mesh, n_crops=8, refresh_steps=0, seed=0)
    tr = SFTGANTrainer(SFTNetConfig(nb=1),
                       SFTGANTrainConfig(d_init_iters=0, other_start_iter=0,
                                         milestones=(1000,),
                                         feature_weight=0.0), mesh=mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    for _ in range(2):
        state, logs = tr.train_step_resident(state, store,
                                             jax.random.PRNGKey(1),
                                             batch_size=8)
    assert int(state["step"]) == 2
    for k, v in logs.items():
        assert np.isfinite(float(v)), (k, v)
    # seg maps arrive one-hot after the device-side /255 cast
    sample = store.make_sampler(8)
    _, seg_b, _, _ = jax.jit(sample)(jax.random.PRNGKey(2), store.lr,
                                     store.seg, store.hr, store.cat)
    u = np.unique(np.asarray(seg_b))
    assert set(u.tolist()) <= {0.0, 1.0}


@pytest.mark.slow
def test_cli_train_sftgan_resident_e2e(tmp_path):
    # sftgan through the real CLI with the seg-aware resident store
    import torch

    root = str(tmp_path)
    img_dir = os.path.join(root, "img")
    seg_dir = os.path.join(root, "bicseg")
    os.makedirs(seg_dir)
    rng = np.random.RandomState(5)
    for i in range(3):
        img = (rng.rand(128, 128, 3) * 255).astype(np.uint8)
        save_img(img, os.path.join(img_dir, f"0{i+1}_a.png"))
        onehot = np.zeros((8, 128, 128), np.float32)
        onehot[(i + 1) % 8] = 1.0
        torch.save(torch.from_numpy(onehot),
                   os.path.join(seg_dir, f"0{i+1}_a.pth"))
    opt = {
        "name": "debug_res_sft",
        "model": "sftgan", "scale": 4, "use_tb_logger": False,
        "datasets": {"train": {
            "name": "s", "mode": "LRHRseg_bg", "dataroot_HR": img_dir,
            "n_workers": 0, "batch_size": 8, "HR_size": 96,
            "use_flip": True, "use_rot": True,
            "resident_crops": 8, "resident_refresh": 0,
        }},
        "path": {"root": root},
        "network_G": {"which_model_G": "sft_arch", "nb": 1},
        "network_D": {"which_model_D": "dis_acd"},
        "train": {"lr_G": 1e-4, "lr_D": 1e-4, "lr_scheme": "MultiStepLR",
                  "lr_steps": [100], "pixel_criterion": "l1",
                  "feature_weight": 0, "D_init_iters": 0,
                  "other_start_iter": 0, "niter": 2},
        "logger": {"print_freq": 2, "save_checkpoint_freq": 4},
    }
    opt_path = os.path.join(root, "opt.json")
    with open(opt_path, "w") as f:
        json.dump(opt, f)
    from esrganplus_tpu.cli.train import main

    main(["-opt", opt_path])
    models = os.path.join(root, "experiments", "debug_res_sft", "models")
    assert os.path.exists(os.path.join(models, "latest_G.pth"))
    # the ACD discriminator exports too (reference SFTGAN_ACD_model semantics)
    assert os.path.exists(os.path.join(models, "latest_D.pth"))

    # and a new run loads both as pretrained through the converters
    opt["name"] = "debug_res_sft_ft"
    opt["path"]["pretrain_model_G"] = os.path.join(models, "latest_G.pth")
    opt["path"]["pretrain_model_D"] = os.path.join(models, "latest_D.pth")
    opt["train"]["niter"] = 1
    with open(opt_path, "w") as f:
        json.dump(opt, f)
    main(["-opt", opt_path])
    exp2 = os.path.join(root, "experiments", "debug_res_sft_ft")
    logs = [f for f in os.listdir(exp2) if f.endswith(".log")]
    text = open(os.path.join(exp2, logs[0])).read()
    assert "loaded pretrained D" in text


def test_cli_train_resident_e2e(tmp_path):
    # the training CLI runs end-to-end with resident_crops enabled
    root = str(tmp_path)
    hr_dir, lr_dir = os.path.join(root, "HR"), os.path.join(root, "LR")
    rng = np.random.RandomState(3)
    for i in range(3):
        img = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
        save_img(img, os.path.join(hr_dir, f"i{i}.png"))
        lr = np.clip(imresize_np(img.astype(np.float32) / 255.0, 0.25), 0, 1)
        save_img((lr * 255).round().astype(np.uint8),
                 os.path.join(lr_dir, f"i{i}.png"))
    opt = {
        "name": "debug_resident",
        "model": "sr", "scale": 4, "use_tb_logger": False,
        "datasets": {"train": {
            "name": "s", "mode": "LRHR", "dataroot_HR": hr_dir,
            "dataroot_LR": lr_dir, "n_workers": 0, "batch_size": 8,
            "HR_size": 16, "use_flip": True, "use_rot": True,
            "resident_crops": 16, "resident_refresh": 4,
        }},
        "path": {"root": root},
        "network_G": {"which_model_G": "RRDB_net", "nf": 8, "nb": 1, "gc": 4},
        "train": {"lr_G": 2e-4, "lr_scheme": "MultiStepLR", "lr_steps": [100],
                  "pixel_criterion": "l1", "niter": 6,
                  "steps_per_dispatch": 4},
        "logger": {"print_freq": 3, "save_checkpoint_freq": 6},
    }
    opt_path = os.path.join(root, "opt.json")
    with open(opt_path, "w") as f:
        json.dump(opt, f)
    from esrganplus_tpu.cli.train import main

    main(["-opt", opt_path])
    assert os.path.exists(os.path.join(root, "experiments", "debug_resident",
                                       "models", "latest_G.pth"))


def test_async_refresh_matches_sync(tmp_path):
    """async_refresh builds the replacement pool in a background thread; the
    swapped-in pool must equal what a synchronous refresh produces (same
    seeded RNG sequence), and training polls must not stall on it."""
    # separate dataset instances: the dataset carries its own seeded crop
    # RNG, which each store's builds advance
    mesh = make_mesh()
    sync = ResidentCropStore(_make_dataset(tmp_path), mesh, n_crops=8,
                             refresh_steps=2, seed=3, async_refresh=False)
    asy = ResidentCropStore(_make_dataset(tmp_path), mesh, n_crops=8,
                            refresh_steps=2, seed=3, async_refresh=True)
    np.testing.assert_array_equal(np.asarray(sync.hr), np.asarray(asy.hr))

    sync.maybe_refresh(2)          # blocks, swaps immediately
    asy.maybe_refresh(2)           # schedules the background build
    asy.flush_refresh()            # test hook: wait for the swap
    np.testing.assert_array_equal(np.asarray(sync.hr), np.asarray(asy.hr))
    np.testing.assert_array_equal(np.asarray(sync.lr), np.asarray(asy.lr))

    # a second cycle through the normal poll path (no flush): spin until
    # the background build lands via maybe_refresh itself
    sync.maybe_refresh(4)
    asy.maybe_refresh(4)
    import time

    deadline = time.time() + 30
    while np.asarray(asy.hr).tobytes() != np.asarray(sync.hr).tobytes():
        assert time.time() < deadline, "async refresh never landed"
        time.sleep(0.05)
        asy.maybe_refresh(5)       # non-boundary poll only harvests


def test_async_refresh_forced_sync_multiprocess(tmp_path, monkeypatch):
    """In a multi-process run the swap step must be identical on every
    process, so async_refresh must fall back to synchronous."""
    ds = _make_dataset(tmp_path)
    mesh = make_mesh()
    store = ResidentCropStore(ds, mesh, n_crops=8, refresh_steps=2, seed=3,
                              async_refresh=True)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    before = np.asarray(store.hr).copy()
    store.maybe_refresh(2)
    assert store._pending is None  # refreshed synchronously, no thread
    assert np.asarray(store.hr).tobytes() != before.tobytes()


def test_async_refresh_surfaces_build_errors(tmp_path, monkeypatch):
    """A failing background rebuild must re-raise its real exception at the
    swap point, not die silently (or as a bare IndexError)."""
    ds = _make_dataset(tmp_path)
    store = ResidentCropStore(ds, make_mesh(), n_crops=8, refresh_steps=2,
                              seed=3, async_refresh=True)

    def boom(*a, **k):
        raise RuntimeError("decode exploded")

    import esrganplus_tpu.data.resident as resident

    monkeypatch.setattr(resident, "build_crop_pool", boom)
    store.maybe_refresh(2)  # schedules the failing build
    with pytest.raises(RuntimeError, match="decode exploded"):
        store.flush_refresh()
