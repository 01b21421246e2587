"""One-shot ×4 SR over a folder of images (reference ``test_image/test.py`` surface).

    python -m esrganplus_tpu.cli.test_image MODEL.pth [--input DIR] [--output DIR]
                                            [--dtype fp32|bf16] [--suffix _rlt]

Defaults mirror the reference: reads ``./LR`` relative to cwd, writes
``./results/<base>_rlt.png``.
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="ESRGAN+ one-shot inference (TPU)")
    ap.add_argument("model", help="path to RRDBNet .pth checkpoint")
    ap.add_argument("--input", default="LR", help="input image dir")
    ap.add_argument("--output", default="results", help="output dir")
    ap.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"])
    ap.add_argument("--suffix", default="_rlt")
    ap.add_argument("--pad-multiple", type=int, default=None,
                    help="pad inputs to a multiple to limit recompiles (inexact borders)")
    ap.add_argument("--noise-seed", type=int, default=None,
                    help="activate noise sites with this deterministic seed "
                         "(nESRGAN+/Tarsier-style stochastic generation)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from esrganplus_tpu.infer import SRInferencer, load_generator
    from esrganplus_tpu.ops.image_io import read_img, save_img, scan_images

    params, cfg, info = load_generator(args.model)
    if info["missing_conv1x1_blocks"]:
        print(f"note: checkpoint lacks conv1x1 weights for "
              f"{len(info['missing_conv1x1_blocks'])} RDBs (vanilla-ESRGAN ckpt); using zeros")
    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    noise_rng = None
    if args.noise_seed is not None:
        import jax

        noise_rng = jax.random.PRNGKey(args.noise_seed)
    inf = SRInferencer(params, cfg, dtype=dtype, pad_multiple=args.pad_multiple,
                       noise_rng=noise_rng)
    print(f"model: nb={cfg.nb} nf={cfg.nf} gc={cfg.gc} x{cfg.upscale} "
          f"conv1x1={cfg.conv1x1} dtype={args.dtype}")

    os.makedirs(args.output, exist_ok=True)
    for i, path in enumerate(scan_images(args.input)):
        base = os.path.splitext(os.path.basename(path))[0]
        img = read_img(path)
        t0 = time.perf_counter()
        out = inf.upscale_bgr_to_png(img)
        dt = time.perf_counter() - t0
        dst = os.path.join(args.output, base + args.suffix + ".png")
        save_img(out, dst)
        mpix = out.shape[0] * out.shape[1] / 1e6
        print(f"[{i+1}] {base}: {img.shape[1]}x{img.shape[0]} -> "
              f"{out.shape[1]}x{out.shape[0]}  {dt:.3f}s ({mpix/dt:.2f} MPix/s out)  -> {dst}")


if __name__ == "__main__":
    main()
