"""Network interpolation: the perception-distortion trade-off dial.

    python -m esrganplus_tpu.cli.net_interp ALPHA PSNR.pth ESRGAN.pth OUT.pth

Per-key linear blend ``(1-α)·W_psnr + α·W_gan`` (reference
``codes/scripts/net_interp.py:16-18``). Works on reference checkpoints and on
checkpoints exported by this framework (same layout). Keys present in only one
checkpoint (e.g. conv1x1 when blending a vanilla-ESRGAN PSNR model with an
ESRGAN+ model) are blended against zeros, which matches the vanilla graph's
semantics.
"""

from __future__ import annotations

import argparse

import numpy as np


def interpolate_state_dicts(sd_a, sd_b, alpha: float):
    out = {}
    for k in set(sd_a) | set(sd_b):
        a = sd_a.get(k)
        b = sd_b.get(k)
        if a is None:
            a = np.zeros_like(b)
        if b is None:
            b = np.zeros_like(a)
        out[k] = (1.0 - alpha) * a + alpha * b
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("alpha", type=float, help="0 = pure first model, 1 = pure second")
    ap.add_argument("model_a", help="PSNR-oriented checkpoint (.pth)")
    ap.add_argument("model_b", help="GAN-oriented checkpoint (.pth)")
    ap.add_argument("out", help="output .pth path")
    args = ap.parse_args(argv)

    import torch

    from esrganplus_tpu.convert import load_state_dict

    sd_a = load_state_dict(args.model_a)
    sd_b = load_state_dict(args.model_b)
    blended = interpolate_state_dicts(sd_a, sd_b, args.alpha)
    torch.save({k: torch.from_numpy(np.array(v, copy=True)) for k, v in blended.items()},
               args.out)
    print(f"alpha={args.alpha}: wrote {len(blended)} keys -> {args.out}")


if __name__ == "__main__":
    main()
