"""Shared fixtures for the two-process multi-host test: tiny configs,
deterministic global batches, and a tiny on-disk LRHR dataset. Every process
(and the single-process reference run) imports THE SAME values from here, so
log equality across runs is meaningful."""

import contextlib
import os
import tempfile

import numpy as np

from esrganplus_tpu.models.discriminator import DiscriminatorVGGConfig
from esrganplus_tpu.models.rrdb import RRDBNetConfig
from esrganplus_tpu.train.gan_model import GANTrainConfig

NET_G = RRDBNetConfig(nf=8, nb=1, gc=4, upscale=4)
NET_D = DiscriminatorVGGConfig(input_size=96, base_nf=8)
# threefry noise: bitwise-identical draws regardless of backend/process count
GAN_CFG = GANTrainConfig(variant="srragan", feature_weight=0.0,
                         noise_prng="threefry", lr_g=1e-3, lr_d=1e-3)

N_STEPS = 2
GLOBAL_BATCH = 8


def SEED_BATCHES():
    """Deterministic (LR, HR) float32 global batches, identical everywhere."""
    rng = np.random.RandomState(1234)
    return [(rng.rand(GLOBAL_BATCH, 24, 24, 3).astype(np.float32),
             rng.rand(GLOBAL_BATCH, 96, 96, 3).astype(np.float32))
            for _ in range(N_STEPS)]


@contextlib.contextmanager
def make_tiny_dataset():
    """4-image LRHR dataset on disk (content seeded — identical on every
    process, so seeded crop pools replicate exactly)."""
    from esrganplus_tpu.data.datasets import LRHRDataset
    from esrganplus_tpu.ops.image_io import save_img
    from esrganplus_tpu.ops.resize import imresize_np

    rng = np.random.RandomState(7)
    with tempfile.TemporaryDirectory() as root:
        hr_dir, lr_dir = os.path.join(root, "HR"), os.path.join(root, "LR")
        for i in range(4):
            img = (rng.rand(128, 128, 3) * 255).astype(np.uint8)
            save_img(img, os.path.join(hr_dir, f"img{i}.png"))
            lr = np.clip(imresize_np(img.astype(np.float32) / 255.0, 0.25), 0, 1)
            save_img((lr * 255).round().astype(np.uint8),
                     os.path.join(lr_dir, f"img{i}.png"))
        yield LRHRDataset({
            "phase": "train", "dataroot_HR": hr_dir, "dataroot_LR": lr_dir,
            "scale": 4, "HR_size": 96, "use_flip": True, "use_rot": True,
        })


def run_logs_to_jsonable(logs):
    return {k: float(v) for k, v in logs.items()}
