import json
import os

import numpy as np
import pytest

from esrganplus_tpu.data import EvalLoader, TrainLoader, collate, create_dataset
from esrganplus_tpu.options import build_net_g_config, build_train_config, check_resume, parse
from esrganplus_tpu.ops.image_io import save_img
from esrganplus_tpu.ops.resize import imresize_np

OPTDIR = os.path.join(os.path.dirname(__file__), "..", "esrganplus_tpu", "options")


@pytest.fixture(scope="module")
def img_root(tmp_path_factory):
    """Synthetic paired dataset: 4 HR 64x64 images + matching x4-down LR."""
    root = tmp_path_factory.mktemp("data")
    hr_dir = root / "HR"
    lr_dir = root / "LR"
    rng = np.random.RandomState(0)
    for i in range(4):
        hr = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        save_img(hr, str(hr_dir / f"img{i}.png"))
        lr = np.clip(imresize_np(hr.astype(np.float32) / 255.0, 0.25), 0, 1)
        save_img((lr * 255).round().astype(np.uint8), str(lr_dir / f"img{i}.png"))
    return str(hr_dir), str(lr_dir)


def test_parse_reference_flagship_options():
    opt = parse(os.path.join(OPTDIR, "train", "train_ESRGANplus.json"), is_train=True)
    assert opt["model"] == "srragan"
    assert opt["datasets"]["train"]["scale"] == 4  # scale propagated
    assert opt["network_G"]["scale"] == 4
    assert opt["nonexistent_key"] is None  # NoneDict semantics
    assert opt["train"]["nope"] is None
    assert opt["path"]["experiments_root"].endswith("experiments/ESRGANplus_x4_DIV2K")
    cfg = build_net_g_config(opt)
    assert cfg.nb == 23 and cfg.nf == 64 and cfg.conv1x1
    tcfg = build_train_config(opt)
    assert tcfg.variant == "srragan" and tcfg.gan_weight == 5e-3
    assert tcfg.milestones == (50000, 100000, 200000, 300000)


def test_parse_debug_mode_overrides(tmp_path):
    from esrganplus_tpu.options.options import _strip_comments
    src = json.loads(_strip_comments(open(os.path.join(OPTDIR, "train", "train_sr.json")).read()))
    src["name"] = "debug_run"
    p = tmp_path / "debug.json"
    p.write_text(json.dumps(src))
    opt = parse(str(p), is_train=True)
    assert opt["train"]["val_freq"] == 8
    assert opt["train"]["save_checkpoint_freq"] == 8
    assert opt["logger"]["print_freq"] == 2


def test_parse_test_options():
    opt = parse(os.path.join(OPTDIR, "test", "test_ESRGANplus.json"), is_train=False)
    assert not opt["is_train"]
    assert opt["path"]["results_root"].endswith("results/ESRGANplus_x4")
    assert set(opt["datasets"]) == {"test_1", "test_2"}


def test_check_resume(tmp_path):
    from esrganplus_tpu.options.options import _strip_comments
    src = json.loads(_strip_comments(open(os.path.join(OPTDIR, "train", "train_ESRGANplus.json")).read()))
    p = tmp_path / "o.json"
    p.write_text(json.dumps(src))
    opt = parse(str(p), is_train=True)
    opt["path"]["resume_state"] = os.path.join(opt["path"]["training_state"], "12.state.npz")
    check_resume(opt)
    assert opt["path"]["pretrain_model_G"].endswith("12_G.pth")
    assert opt["path"]["pretrain_model_D"].endswith("12_D.pth")


def test_lrhr_dataset_paired_crop(img_root):
    hr_dir, lr_dir = img_root
    ds = create_dataset({
        "mode": "LRHR", "phase": "train", "scale": 4, "HR_size": 32,
        "dataroot_HR": hr_dir, "dataroot_LR": lr_dir,
        "use_flip": True, "use_rot": True, "seed": 1,
    })
    assert len(ds) == 4
    s = ds[0]
    assert s["LR"].shape == (8, 8, 3) and s["HR"].shape == (32, 32, 3)
    assert s["LR"].dtype == np.float32
    assert 0.0 <= s["LR"].min() and s["HR"].max() <= 1.0


def test_lrhr_dataset_crop_alignment(img_root):
    # With aug off, the LR crop must be exactly the downscale-aligned window.
    hr_dir, lr_dir = img_root
    ds = create_dataset({
        "mode": "LRHR", "phase": "train", "scale": 4, "HR_size": 32,
        "dataroot_HR": hr_dir, "dataroot_LR": lr_dir,
        "use_flip": False, "use_rot": False, "seed": 3,
    })
    s = ds[1]
    # recompute: the HR crop downscaled with the canonical kernel should be close
    # to the LR crop (they came from the same full-image downscale, so only
    # boundary taps differ; interior agrees)
    lr_est = imresize_np(s["HR"][:, :, ::-1], 0.25)[:, :, ::-1]
    inner = (slice(2, -2), slice(2, -2), slice(None))
    assert np.abs(lr_est[inner] - s["LR"][inner]).max() < 0.08


def test_lrhr_dataset_undersized_rescue_with_disk_lr(tmp_path):
    # The rescue applies in train phase even when LR was loaded from disk
    # (reference LRHR_dataset.py:88-96 overwrites the disk LR): an HR smaller
    # than HR_size must still yield full-size crops instead of crashing collate.
    hr_dir = tmp_path / "HR"
    lr_dir = tmp_path / "LR"
    rng = np.random.RandomState(7)
    for i, side in enumerate((24, 64)):  # one undersized, one normal
        hr = (rng.rand(side, side, 3) * 255).astype(np.uint8)
        save_img(hr, str(hr_dir / f"img{i}.png"))
        lr = np.clip(imresize_np(hr.astype(np.float32) / 255.0, 0.25), 0, 1)
        save_img((lr * 255).round().astype(np.uint8), str(lr_dir / f"img{i}.png"))
    ds = create_dataset({
        "mode": "LRHR", "phase": "train", "scale": 4, "HR_size": 32,
        "dataroot_HR": str(hr_dir), "dataroot_LR": str(lr_dir),
        "use_flip": False, "use_rot": False, "seed": 0,
    })
    for i in range(2):
        s = ds[i]
        assert s["HR"].shape == (32, 32, 3), (i, s["HR"].shape)
        assert s["LR"].shape == (8, 8, 3), (i, s["LR"].shape)
    batch = collate([ds[0], ds[1]])
    assert batch["HR"].shape == (2, 32, 32, 3)


def test_lrhr_dataset_onthefly_lr(img_root):
    hr_dir, _ = img_root
    ds = create_dataset({
        "mode": "LRHR", "phase": "val", "scale": 4,
        "dataroot_HR": hr_dir,
    })
    s = ds[0]
    assert s["HR"].shape == (64, 64, 3)
    assert s["LR"].shape == (16, 16, 3)


def test_lr_dataset(img_root):
    _, lr_dir = img_root
    ds = create_dataset({"mode": "LR", "phase": "test", "dataroot_LR": lr_dir})
    s = ds[0]
    assert s["LR"].shape == (16, 16, 3) and "LR_path" in s


def test_train_loader_batches(img_root):
    hr_dir, lr_dir = img_root
    ds = create_dataset({
        "mode": "LRHR", "phase": "train", "scale": 4, "HR_size": 32,
        "dataroot_HR": hr_dir, "dataroot_LR": lr_dir, "seed": 0,
    })
    loader = TrainLoader(ds, batch_size=2, num_workers=2, seed=0)
    it = iter(loader)
    batches = [next(it) for _ in range(5)]
    loader.stop()
    for b in batches:
        assert b["LR"].shape == (2, 8, 8, 3)
        assert b["HR"].shape == (2, 32, 32, 3)


def test_collate():
    out = collate([{"a": np.zeros((2, 2)), "p": "x"}, {"a": np.ones((2, 2)), "p": "y"}])
    assert out["a"].shape == (2, 2, 2) and out["p"] == ["x", "y"]


def test_lrhr_dataset_image_cache(img_root, monkeypatch):
    """cache_images: decode once per file, serve identical samples after."""
    import esrganplus_tpu.data.datasets as ds_mod

    hr_dir, lr_dir = img_root
    calls = {"n": 0}
    real = ds_mod.read_img

    def counting(path):
        calls["n"] += 1
        return real(path)

    monkeypatch.setattr(ds_mod, "read_img", counting)
    opt = {
        "mode": "LRHR", "phase": "train", "scale": 4, "HR_size": 32,
        "dataroot_HR": hr_dir, "dataroot_LR": lr_dir,
        "use_flip": False, "use_rot": False, "seed": 3,
        "cache_images": True,
    }
    ds = create_dataset(opt)
    first = [ds[i] for i in range(4)]
    assert calls["n"] == 8  # 4 HR + 4 LR decodes
    again = [ds[i] for i in range(4)]
    assert calls["n"] == 8  # all cache hits
    for a, b in zip(first, again):
        # same seed stream differs per call, so compare the underlying images
        assert a["HR_path"] == b["HR_path"]
    # uncached dataset re-decodes every epoch
    ds2 = create_dataset({**opt, "cache_images": False})
    calls["n"] = 0
    _ = [ds2[i] for i in range(4)]
    _ = [ds2[i] for i in range(4)]
    assert calls["n"] == 16

    # cap: a tiny budget stops inserting but never breaks reads
    ds3 = create_dataset({**opt, "cache_images_gb": 1e-9})
    s0 = ds3[0]
    s1 = ds3[0]
    assert s0["HR"].shape == s1["HR"].shape
