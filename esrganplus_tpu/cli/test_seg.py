"""Segmentation inference for SFT-GAN conditioning (reference ``codes/test_seg.py``).

    python -m esrganplus_tpu.cli.test_seg MODEL.pth --input DIR --output ROOT

Per HR image: modcrop 8, bicubic ÷4→×4 ("bic" degradation), Caffe-style BGR mean
subtraction, segmentation forward → writes probability maps
(``<root>_segprob/<base>_bic.pth``, torch tensor 8×H×W for reference interop),
byte annotation images and colourised maps.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# RGB lookup, class 0..7 + void (reference test_seg.py:34-45)
LOOKUP = np.array([
    [153, 153, 153], [0, 255, 255], [109, 158, 235], [183, 225, 205],
    [153, 0, 255], [17, 85, 204], [106, 168, 79], [224, 102, 102],
    [255, 255, 255],
], np.float32) / 255.0

BGR_MEANS = (103.939, 116.779, 123.68)


def main(argv=None):
    from esrganplus_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("model", help="segmentation .pth checkpoint")
    ap.add_argument("--input", required=True, help="HR image folder")
    ap.add_argument("--output", required=True, help="output root (creates *_segprob etc.)")
    args = ap.parse_args(argv)

    import jax
    import torch

    from esrganplus_tpu.convert.pth import load_state_dict
    from esrganplus_tpu.models.seg import seg_forward, seg_from_state_dict
    from esrganplus_tpu.ops.color import modcrop
    from esrganplus_tpu.ops.image_io import read_img, save_img, scan_images
    from esrganplus_tpu.ops.resize import imresize_np

    params = seg_from_state_dict(load_state_dict(args.model))
    fwd = jax.jit(lambda p, x: seg_forward(p, x))

    prob_dir = args.output + "_segprob"
    byte_dir = args.output + "_byteimg"
    color_dir = args.output + "_colorimg"
    for d in (prob_dir, byte_dir, color_dir):
        os.makedirs(d, exist_ok=True)

    for path in scan_images(args.input):
        base = os.path.splitext(os.path.basename(path))[0]
        img = read_img(path)  # BGR [0,1]
        img = modcrop(img, 8)
        img_bic = imresize_np(imresize_np(img, 0.25), 4.0) * 255.0  # BGR [0,255]
        x = img_bic - np.asarray(BGR_MEANS, np.float32)
        prob = np.asarray(fwd(params, x[None]))[0]  # [H, W, 8]

        # reference-compatible prob map: torch tensor [8, H, W]
        torch.save(torch.from_numpy(np.transpose(prob, (2, 0, 1)).copy()),
                   os.path.join(prob_dir, base + "_bic.pth"))
        argmax = prob.argmax(-1).astype(np.uint8)
        save_img(argmax, os.path.join(byte_dir, base + ".png"))
        color_rgb = LOOKUP[np.minimum(argmax, 8)]
        save_img((color_rgb[:, :, ::-1] * 255).round().astype(np.uint8),
                 os.path.join(color_dir, base + ".png"))
        print(base, prob.shape)


if __name__ == "__main__":
    main()
