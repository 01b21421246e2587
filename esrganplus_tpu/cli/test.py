"""Batch evaluation entry point (reference ``codes/test.py`` surface).

    python -m esrganplus_tpu.cli.test -opt path/to/test_options.json

Per test set: run ×scale SR on every image, save results under
``results/<name>/<set>/``, and report PSNR/SSIM (and Y-channel variants) with
the reference protocol: border crop = scale, BT.601 Y, MATLAB-style SSIM
(``codes/test.py:70-110``).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    from esrganplus_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("-opt", required=True, help="path to option JSON file")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from esrganplus_tpu.data import EvalLoader, create_dataset
    from esrganplus_tpu.infer import SRInferencer
    from esrganplus_tpu.convert import load_state_dict
    from esrganplus_tpu.convert.pth import generator_from_state_dict
    from esrganplus_tpu.options.options import build_net_g_config, dict2str, parse
    from esrganplus_tpu.ops.color import bgr2ycbcr
    from esrganplus_tpu.ops.image_io import save_img, tensor2img
    from esrganplus_tpu.ops.metrics import calculate_psnr, calculate_ssim
    from esrganplus_tpu.utils import setup_logger

    opt = parse(args.opt, is_train=False)
    os.makedirs(opt["path"]["results_root"], exist_ok=True)
    logger = setup_logger("base", opt["path"]["log"], "test", screen=True)
    logger.info(dict2str(opt))

    net_g = build_net_g_config(opt)
    model_path = opt["path"]["pretrain_model_G"]
    assert model_path, "path.pretrain_model_G must point to a checkpoint"
    params, net_g, info = generator_from_state_dict(load_state_dict(model_path), net_g)
    if info["missing_conv1x1_blocks"]:
        logger.info(f"checkpoint lacks conv1x1 for {len(info['missing_conv1x1_blocks'])} "
                    "RDBs; zeros substituted (vanilla-ESRGAN checkpoint)")
    dtype = jnp.bfloat16 if (opt.get("compute_dtype") == "bfloat16") else None
    inferencer = SRInferencer(params, net_g, dtype=dtype)
    scale = net_g.upscale
    # mode: 'normal' | 'x8' (geometric self-ensemble) | 'tiled' (large inputs)
    mode = opt.get("test_mode") or "normal"
    if mode == "x8":
        upscale_fn = inferencer.upscale_x8
    elif mode == "tiled":
        upscale_fn = lambda img: inferencer.upscale_tiled(
            img, tile=opt.get("tile_size") or 128,
            halo=opt.get("tile_halo"))  # None → derived from the weights
    else:
        upscale_fn = inferencer.upscale

    # Shard Set5/Set14-style sweeps across the mesh's data axis when more
    # than one device is attached (interior-exact; borders within the
    # receptive radius of the pad edge differ — set eval_sharded: false for
    # strict whole-image border parity).
    import jax

    sharded = None
    if (mode == "normal" and len(jax.devices()) > 1
            and opt.get("eval_sharded") is not False):
        from esrganplus_tpu.infer import ShardedEvaluator
        from esrganplus_tpu.parallel import make_mesh

        sharded = ShardedEvaluator(net_g, make_mesh(), dtype=dtype)
        logger.info(f"sharded eval over {sharded.ndev} devices")

    def iter_results(test_set):
        loader = EvalLoader(test_set)
        if sharded is None:
            for sample in loader:
                yield sample, upscale_fn(sample["LR"])
            return
        chunk: list = []
        for sample in loader:
            chunk.append(sample)
            if len(chunk) == 4 * sharded.ndev:
                for s, sr in zip(chunk, sharded.upscale_batch(
                        inferencer.params, [c["LR"] for c in chunk])):
                    yield s, sr
                chunk = []
        if chunk:
            for s, sr in zip(chunk, sharded.upscale_batch(
                    inferencer.params, [c["LR"] for c in chunk])):
                yield s, sr

    for name, ds_opt in opt["datasets"].items():
        ds_opt["phase"] = "test"
        test_set = create_dataset(ds_opt)
        set_name = ds_opt.get("name", name)
        logger.info(f"\nTesting [{set_name}]...")
        dataset_dir = os.path.join(opt["path"]["results_root"], set_name)
        os.makedirs(dataset_dir, exist_ok=True)

        metrics = {"psnr": [], "ssim": [], "psnr_y": [], "ssim_y": []}
        t0 = time.time()
        for sample, sr in iter_results(test_set):
            base = os.path.splitext(os.path.basename(sample["LR_path"]))[0]
            sr_img = tensor2img(sr)  # BGR uint8
            suffix = opt.get("suffix") or ""
            save_img(sr_img, os.path.join(dataset_dir, base + suffix + ".png"))

            if "HR" in sample:
                gt_img = tensor2img(sample["HR"])
                sr_f = sr_img.astype(np.float64) / 255.0
                gt_f = gt_img.astype(np.float64) / 255.0
                c = scale
                sr_c = sr_f[c:-c, c:-c, ...]
                gt_c = gt_f[c:-c, c:-c, ...]
                psnr = calculate_psnr(sr_c * 255, gt_c * 255)
                ssim = calculate_ssim(sr_c * 255, gt_c * 255)
                metrics["psnr"].append(psnr)
                metrics["ssim"].append(ssim)
                if gt_img.ndim == 3:
                    sr_y = bgr2ycbcr(sr_f.astype(np.float32), only_y=True)
                    gt_y = bgr2ycbcr(gt_f.astype(np.float32), only_y=True)
                    psnr_y = calculate_psnr(sr_y[c:-c, c:-c] * 255, gt_y[c:-c, c:-c] * 255)
                    ssim_y = calculate_ssim(sr_y[c:-c, c:-c] * 255, gt_y[c:-c, c:-c] * 255)
                    metrics["psnr_y"].append(psnr_y)
                    metrics["ssim_y"].append(ssim_y)
                    logger.info(f"{base:20s} - PSNR: {psnr:.6f} dB; SSIM: {ssim:.6f}; "
                                f"PSNR_Y: {psnr_y:.6f} dB; SSIM_Y: {ssim_y:.6f}.")
                else:
                    logger.info(f"{base:20s} - PSNR: {psnr:.6f} dB; SSIM: {ssim:.6f}.")
            else:
                logger.info(base)

        if metrics["psnr"]:
            logger.info(f"[{set_name}] ({time.time()-t0:.1f}s) Average PSNR/SSIM: "
                        f"{np.mean(metrics['psnr']):.6f} dB / {np.mean(metrics['ssim']):.6f}")
            if metrics["psnr_y"]:
                logger.info(f"[{set_name}] Average PSNR_Y/SSIM_Y: "
                            f"{np.mean(metrics['psnr_y']):.6f} dB / {np.mean(metrics['ssim_y']):.6f}")


if __name__ == "__main__":
    main()
