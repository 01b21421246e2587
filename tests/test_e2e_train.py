"""End-to-end debug training runs through the real CLI entry points."""

import json
import os

import numpy as np
import pytest

from esrganplus_tpu.ops.image_io import save_img
from esrganplus_tpu.ops.resize import imresize_np


def _make_dataset(root, n=4, hr=64):
    hr_dir = os.path.join(root, "HR")
    lr_dir = os.path.join(root, "LR")
    rng = np.random.RandomState(7)
    for i in range(n):
        img = (rng.rand(hr, hr, 3) * 255).astype(np.uint8)
        save_img(img, os.path.join(hr_dir, f"img{i}.png"))
        lr = np.clip(imresize_np(img.astype(np.float32) / 255.0, 0.25), 0, 1)
        save_img((lr * 255).round().astype(np.uint8), os.path.join(lr_dir, f"img{i}.png"))
    return hr_dir, lr_dir


def _base_options(root, hr_dir, lr_dir):
    return {
        "name": "debug_e2e",
        "model": "sr",
        "scale": 4,
        "use_tb_logger": False,
        "datasets": {
            "train": {
                "name": "synthetic", "mode": "LRHR",
                "dataroot_HR": hr_dir, "dataroot_LR": lr_dir,
                "n_workers": 2, "batch_size": 8, "HR_size": 32,
                "use_flip": True, "use_rot": True,
            },
            "val": {
                "name": "synthetic_val", "mode": "LRHR",
                "dataroot_HR": hr_dir, "dataroot_LR": lr_dir,
            },
        },
        "path": {"root": root},
        "network_G": {
            "which_model_G": "RRDB_net", "norm_type": None, "mode": "CNA",
            "nf": 8, "nb": 1, "in_nc": 3, "out_nc": 3, "gc": 4,
            "gaussian_noise": True,
        },
        "train": {
            "lr_G": 1e-3, "lr_scheme": "MultiStepLR", "lr_steps": [1000],
            "lr_gamma": 0.5, "pixel_criterion": "l1", "pixel_weight": 1.0,
            "manual_seed": 0, "niter": 10,
        },
        "logger": {"print_freq": 2},
    }


def test_debug_sr_train_cycle(tmp_path):
    from esrganplus_tpu.cli.train import main

    root = str(tmp_path)
    hr_dir, lr_dir = _make_dataset(root)
    opt = _base_options(root, hr_dir, lr_dir)
    opt_path = os.path.join(root, "opt.json")
    json.dump(opt, open(opt_path, "w"))

    main(["-opt", opt_path])

    exp = os.path.join(root, "experiments", "debug_e2e")
    # debug mode: val/ckpt every 8 iters → one checkpoint at step 8
    assert os.path.exists(os.path.join(exp, "training_state", "8.state.npz"))
    assert os.path.exists(os.path.join(exp, "models", "8_G.pth"))
    assert os.path.exists(os.path.join(exp, "models", "latest_G.pth"))
    val_dirs = os.listdir(os.path.join(exp, "val_images"))
    assert len(val_dirs) == 4
    logs = [f for f in os.listdir(exp) if f.endswith(".log")]
    assert logs
    text = open(os.path.join(exp, logs[0])).read()
    assert "Validation # PSNR" in text

    # exported checkpoint is loadable by the converter
    from esrganplus_tpu.convert import load_state_dict, rrdbnet_from_state_dict

    params, cfg, _ = rrdbnet_from_state_dict(
        load_state_dict(os.path.join(exp, "models", "latest_G.pth")))
    assert cfg.nb == 1 and cfg.nf == 8 and cfg.gc == 4


def test_debug_sr_resume(tmp_path):
    from esrganplus_tpu.cli.train import main

    root = str(tmp_path)
    hr_dir, lr_dir = _make_dataset(root)
    opt = _base_options(root, hr_dir, lr_dir)
    opt["train"]["niter"] = 8
    opt_path = os.path.join(root, "opt.json")
    json.dump(opt, open(opt_path, "w"))
    main(["-opt", opt_path])

    state_file = os.path.join(root, "experiments", "debug_e2e", "training_state",
                              "8.state.npz")
    assert os.path.exists(state_file)
    opt["path"]["resume_state"] = state_file
    opt["train"]["niter"] = 12
    json.dump(opt, open(opt_path, "w"))
    main(["-opt", opt_path])
    # resumed run continues from step 8 → no second "8" checkpoint, ends at 12
    logs_dir = os.path.join(root, "experiments", "debug_e2e")
    logs = sorted(f for f in os.listdir(logs_dir) if f.endswith(".log"))
    text = open(os.path.join(logs_dir, logs[-1])).read()
    assert "resumed" in text


def test_debug_srragan_train_cycle(tmp_path):
    from esrganplus_tpu.cli.train import main

    root = str(tmp_path)
    hr_dir, lr_dir = _make_dataset(root, hr=128)
    opt = _base_options(root, hr_dir, lr_dir)
    opt["name"] = "debug_gan"
    opt["model"] = "srragan"
    opt["datasets"]["train"]["HR_size"] = 128
    opt["datasets"]["train"]["batch_size"] = 8
    opt["network_D"] = {
        "which_model_D": "discriminator_vgg_128", "norm_type": "batch",
        "act_type": "leakyrelu", "mode": "CNA", "nf": 8, "in_nc": 3,
    }
    opt["train"].update({
        "lr_D": 1e-3, "beta1_G": 0.9, "beta1_D": 0.9,
        "pixel_weight": 1e-2, "feature_weight": 0,  # skip VGG (no weights)
        "gan_type": "vanilla", "gan_weight": 5e-3,
        "D_update_ratio": 1, "D_init_iters": 0, "niter": 9,
    })
    opt_path = os.path.join(root, "opt.json")
    json.dump(opt, open(opt_path, "w"))
    main(["-opt", opt_path])

    exp = os.path.join(root, "experiments", "debug_gan")
    assert os.path.exists(os.path.join(exp, "models", "8_G.pth"))
    assert os.path.exists(os.path.join(exp, "models", "8_D.pth"))
    assert os.path.exists(os.path.join(exp, "models", "latest_D.pth"))

    # a new experiment fine-tunes FROM the exported G+D — the reference loads
    # pretrain_model_D for GAN models (SRGAN_model.py:233)
    opt["name"] = "debug_gan_ft"
    opt["path"]["pretrain_model_G"] = os.path.join(exp, "models", "latest_G.pth")
    opt["path"]["pretrain_model_D"] = os.path.join(exp, "models", "latest_D.pth")
    opt["train"]["niter"] = 2
    json.dump(opt, open(opt_path, "w"))
    main(["-opt", opt_path])
    exp2 = os.path.join(root, "experiments", "debug_gan_ft")
    logs = [f for f in os.listdir(exp2) if f.endswith(".log")]
    text = open(os.path.join(exp2, logs[0])).read()
    assert "loaded pretrained G" in text and "loaded pretrained D" in text


def test_cli_test_eval(tmp_path):
    """The test CLI computes the reference metric protocol over a folder."""
    import torch

    from esrganplus_tpu.cli.test import main as test_main

    root = str(tmp_path)
    hr_dir, lr_dir = _make_dataset(root)
    # reuse the small golden checkpoint (nb=3 nf=32 gc=32)
    golden = os.path.join(os.path.dirname(__file__), "golden", "rrdb_small_x4.pth")
    opt = {
        "name": "eval_run",
        "model": "sr",
        "scale": 4,
        "datasets": {
            "test_1": {"name": "synthetic", "mode": "LRHR",
                       "dataroot_HR": hr_dir, "dataroot_LR": lr_dir},
        },
        "path": {"root": root, "pretrain_model_G": golden},
        "network_G": {
            "which_model_G": "RRDB_net", "norm_type": None, "mode": "CNA",
            "nf": 32, "nb": 3, "in_nc": 3, "out_nc": 3, "gc": 32,
        },
    }
    opt_path = os.path.join(root, "opt.json")
    json.dump(opt, open(opt_path, "w"))
    test_main(["-opt", opt_path])

    results = os.path.join(root, "results", "eval_run", "synthetic")
    assert len([f for f in os.listdir(results) if f.endswith(".png")]) == 4
    logs_dir = os.path.join(root, "results", "eval_run")
    logs = [f for f in os.listdir(logs_dir) if f.endswith(".log")]
    text = open(os.path.join(logs_dir, logs[0])).read()
    assert "Average PSNR/SSIM" in text and "PSNR_Y" in text


def test_scale3_fallback_end_to_end(tmp_path):
    """Scale-3 RRDBNet (the reference's special case,
    architecture.py:51-53,66-69) takes the XLA tail — `_use_pallas_tail`
    requires upscale in (2, 4) — and the prepared-masters gate stays off.
    The whole chain must still compose: train, checkpoint, resume, .pth
    export, SRInferencer round-trip."""
    import jax.numpy as jnp

    from esrganplus_tpu.cli.train import main
    from esrganplus_tpu.models.rrdb import (
        RRDBNetConfig, _use_pallas_tail, prep_trunk_static)

    cfg3 = RRDBNetConfig(nf=8, nb=1, gc=4, upscale=3)
    assert not _use_pallas_tail(cfg3)
    assert not prep_trunk_static(cfg3, jnp.bfloat16)

    root = str(tmp_path)
    hr_dir = os.path.join(root, "HR")
    lr_dir = os.path.join(root, "LR")
    rng = np.random.RandomState(7)
    for i in range(4):
        img = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
        save_img(img, os.path.join(hr_dir, f"img{i}.png"))
        lr = np.clip(imresize_np(img.astype(np.float32) / 255.0, 1 / 3), 0, 1)
        save_img((lr * 255).round().astype(np.uint8),
                 os.path.join(lr_dir, f"img{i}.png"))

    opt = _base_options(root, hr_dir, lr_dir)
    opt["name"] = "debug_scale3"
    opt["scale"] = 3
    opt["datasets"]["train"]["HR_size"] = 24
    opt["train"]["niter"] = 8
    opt_path = os.path.join(root, "opt.json")
    json.dump(opt, open(opt_path, "w"))
    main(["-opt", opt_path])

    exp = os.path.join(root, "experiments", "debug_scale3")
    state_file = os.path.join(exp, "training_state", "8.state.npz")
    assert os.path.exists(state_file)

    # resume continues on the same (XLA-tail, unprepped) representation
    opt["path"]["resume_state"] = state_file
    opt["train"]["niter"] = 10
    json.dump(opt, open(opt_path, "w"))
    main(["-opt", opt_path])
    logs = sorted(f for f in os.listdir(exp) if f.endswith(".log"))
    assert "resumed" in open(os.path.join(exp, logs[-1])).read()

    # exported .pth round-trips through the converter + SRInferencer. A
    # 1-upconv state dict is AMBIGUOUS between scale 2 and 3 (same keys and
    # shapes — the reference needs opt['scale'] too), so the caller passes
    # the scale-3 cfg explicitly.
    from esrganplus_tpu.convert import load_state_dict, rrdbnet_from_state_dict
    from esrganplus_tpu.infer import SRInferencer

    pth = os.path.join(exp, "models", "latest_G.pth")
    params, cfg, _ = rrdbnet_from_state_dict(load_state_dict(pth), cfg3)
    assert cfg.upscale == 3
    inf = SRInferencer(params, cfg)
    out = inf.upscale(np.random.RandomState(0).rand(12, 12, 3).astype(np.float32))
    assert out.shape == (36, 36, 3)
