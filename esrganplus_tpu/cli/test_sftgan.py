"""SFT-GAN inference (reference ``codes/test_sftgan.py``).

    python -m esrganplus_tpu.cli.test_sftgan MODEL.pth --input DIR --segprob DIR
                                             [--output DIR] [--legacy]

Per HR image: modcrop 8 → RGB [0,1] → bicubic ÷4 LR; seg probabilities read from
``<segprob>/<base>_bic.pth`` (as produced by test_seg); forward (LR, seg) →
``<base>_rlt.png``. ``--legacy`` selects the torch-version SFT semantics
(``SFT_Net_torch``, reference sft_arch.py:150-226).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    from esrganplus_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("model", help="SFT_Net .pth checkpoint")
    ap.add_argument("--input", required=True, help="HR image folder")
    ap.add_argument("--segprob", required=True, help="folder of <base>_bic.pth seg maps")
    ap.add_argument("--output", default="results_sftgan")
    ap.add_argument("--legacy", action="store_true", help="torch-version SFT semantics")
    args = ap.parse_args(argv)

    import jax
    import torch

    from esrganplus_tpu.convert.pth import load_state_dict
    from esrganplus_tpu.models.sft import SFTNetConfig, sftnet_forward, sftnet_from_state_dict
    from esrganplus_tpu.ops.color import modcrop
    from esrganplus_tpu.ops.image_io import img2tensor, read_img, save_img, scan_images, tensor2img
    from esrganplus_tpu.ops.resize import imresize_np

    sd = load_state_dict(args.model)
    params, cfg = sftnet_from_state_dict(sd, SFTNetConfig(legacy=args.legacy))
    fwd = jax.jit(lambda p, i, s: sftnet_forward(p, i, s, cfg))

    os.makedirs(args.output, exist_ok=True)
    for path in scan_images(args.input):
        base = os.path.splitext(os.path.basename(path))[0]
        img = modcrop(read_img(path), 8)  # BGR [0,1]
        lr = imresize_np(img, 0.25)
        lr_rgb = img2tensor(np.clip(lr, 0, 1))
        seg = torch.load(os.path.join(args.segprob, base + "_bic.pth"),
                         map_location="cpu", weights_only=True)
        seg = np.transpose(np.asarray(seg), (1, 2, 0))  # [H, W, 8]
        out = np.asarray(fwd(params, lr_rgb[None], seg[None].astype(np.float32)))[0]
        save_img(tensor2img(np.clip(out, 0, 1)), os.path.join(args.output, base + "_rlt.png"))
        print(base, out.shape)


if __name__ == "__main__":
    main()
