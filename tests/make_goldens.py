"""Generate golden fixtures by RUNNING the reference implementation (/root/reference).

Run once (offline, CPU torch) and commit the resulting .npz files under
tests/golden/. Tests then compare esrganplus_tpu against these fixtures without
needing the reference mounted.

Usage: python tests/make_goldens.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REF = os.environ.get("REFERENCE_PATH", "/root/reference")
HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden")
# Large fixtures regenerate on demand from the reference; not committed.
CACHE = os.path.join(HERE, "golden_cache")


def ensure_cached_goldens() -> bool:
    """Generate large fixtures into tests/golden_cache if missing. Returns False
    when the reference checkout is unavailable (callers should skip)."""
    return ensure_discriminator_goldens(128)


def ensure_discriminator_goldens(size: int = 128) -> bool:
    """Full-shape (base_nf=64, BN on) D_VGG_{96,128,192} golden fixtures."""
    if os.path.exists(os.path.join(CACHE, f"d_vgg{size}_io.npz")):
        return True
    if not os.path.isdir(REF):
        return False
    _make_discriminator_goldens(size)
    return True


def ensure_flagship_golden() -> bool:
    """Flagship-shaped (nb=23, nf=64, gc=32) fp32 forward fixture — cached,
    regenerates from the reference on demand (the .pth is ~64 MB)."""
    if os.path.exists(os.path.join(CACHE, "rrdb_flagship_io.npz")):
        return True
    if not os.path.isdir(REF):
        return False
    _make_flagship_golden()
    return True


def _make_flagship_golden():
    import torch

    ref_arch = _import_test_image_arch()
    os.makedirs(CACHE, exist_ok=True)
    torch.manual_seed(17)
    net = ref_arch.RRDB_Net(3, 3, 64, 23, gc=32, upscale=4).eval()
    x = torch.rand(1, 3, 96, 96)
    with torch.no_grad():
        y = net(x)
    torch.save(net.state_dict(), os.path.join(CACHE, "rrdb_flagship.pth"))
    np.savez_compressed(os.path.join(CACHE, "rrdb_flagship_io.npz"),
                        x=x.numpy(), y=y.numpy())


def ensure_sft_goldens() -> bool:
    if os.path.exists(os.path.join(CACHE, "sft_io.npz")):
        return True
    if not os.path.isdir(REF):
        return False
    _make_sft_goldens()
    return True


def ensure_seg_goldens() -> bool:
    if os.path.exists(os.path.join(CACHE, "seg_io.npz")):
        return True
    if not os.path.isdir(REF):
        return False
    _make_seg_goldens()
    return True


def _make_sft_goldens():
    import torch

    _import_reference_modules()
    sys.path.insert(0, os.path.join(REF, "codes"))
    import models.modules.sft_arch as sft_arch

    os.makedirs(CACHE, exist_ok=True)
    torch.manual_seed(41)
    net = sft_arch.SFT_Net().eval()
    img = torch.rand(1, 3, 24, 24)
    seg = torch.softmax(torch.randn(1, 8, 96, 96), dim=1)
    with torch.no_grad():
        out = net((img, seg))
    torch.save(net.state_dict(), os.path.join(CACHE, "sft_net.pth"))
    np.savez_compressed(os.path.join(CACHE, "sft_io.npz"),
                        img=img.numpy(), seg=seg.numpy(), out=out.numpy())

    torch.manual_seed(43)
    acd = sft_arch.ACD_VGG_BN_96().train()
    x = torch.rand(2, 3, 96, 96)
    with torch.no_grad():
        gan_t, cls_t = acd(x)
    acd.eval()
    with torch.no_grad():
        gan_e, cls_e = acd(x)
    torch.save(acd.state_dict(), os.path.join(CACHE, "acd.pth"))
    np.savez_compressed(os.path.join(CACHE, "acd_io.npz"), x=x.numpy(),
                        gan_t=gan_t.numpy(), cls_t=cls_t.numpy(),
                        gan_e=gan_e.numpy(), cls_e=cls_e.numpy())


def ensure_featex_goldens() -> bool:
    if os.path.exists(os.path.join(CACHE, "minc_io.npz")):
        return True
    if not os.path.isdir(REF):
        return False
    _make_featex_goldens()
    return True


def _make_featex_goldens():
    import torch
    import torch.nn as nn

    _import_reference_modules()
    sys.path.insert(0, os.path.join(REF, "codes"))
    import models.modules.architecture as codes_arch

    os.makedirs(CACHE, exist_ok=True)
    torch.manual_seed(51)
    minc = codes_arch.MINCNet().eval()
    x = torch.rand(1, 3, 49, 37)  # odd sizes exercise ceil-mode pools
    with torch.no_grad():
        out = minc(x)
    torch.save(minc.state_dict(), os.path.join(CACHE, "minc.pth"))
    np.savez_compressed(os.path.join(CACHE, "minc_io.npz"), x=x.numpy(), out=out.numpy())

    # ResNet "mini" in torchvision key layout (1 bottleneck per stage, width/4):
    # validates the converter + forward against real torch semantics without a
    # 170 MB resnet101 fixture. torchvision is absent, so replicate the layout.
    class Bottleneck(nn.Module):
        def __init__(self, cin, mid, cout, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, mid, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(mid)
            self.conv2 = nn.Conv2d(mid, mid, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(mid)
            self.conv3 = nn.Conv2d(mid, cout, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            self.downsample = None
            if cin != cout or stride != 1:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout))
            self.relu = nn.ReLU(True)

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            r = self.relu(self.bn1(self.conv1(x)))
            r = self.relu(self.bn2(self.conv2(r)))
            r = self.bn3(self.conv3(r))
            return self.relu(idt + r)

    class MiniResNet(nn.Module):
        def __init__(self):
            super().__init__()
            w = 16
            self.conv1 = nn.Conv2d(3, w, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(w)
            self.relu = nn.ReLU(True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = nn.Sequential(Bottleneck(w, w, w * 4, 1))
            self.layer2 = nn.Sequential(Bottleneck(w * 4, w * 2, w * 8, 2))
            self.layer3 = nn.Sequential(Bottleneck(w * 8, w * 4, w * 16, 2))
            self.layer4 = nn.Sequential(Bottleneck(w * 16, w * 8, w * 32, 2))

        def forward(self, x):
            h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            return self.layer4(self.layer3(self.layer2(self.layer1(h))))

    torch.manual_seed(53)
    net = MiniResNet().eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.7, 1.3)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    xr = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        outr = net((xr - mean) / std)
    torch.save(net.state_dict(), os.path.join(CACHE, "resnet_mini.pth"))
    np.savez_compressed(os.path.join(CACHE, "resnet_mini_io.npz"),
                        x=xr.numpy(), out=outr.numpy())


def _make_seg_goldens():
    import torch

    _import_reference_modules()
    sys.path.insert(0, os.path.join(REF, "codes"))
    import models.modules.seg_arch as seg_arch

    os.makedirs(CACHE, exist_ok=True)
    torch.manual_seed(47)
    net = seg_arch.OutdoorSceneSeg().eval()
    # randomise BN running stats so eval-mode parity is non-trivial
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.6, 1.4)
    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        out = net(x)
    torch.save(net.state_dict(), os.path.join(CACHE, "seg.pth"))
    np.savez_compressed(os.path.join(CACHE, "seg_io.npz"), x=x.numpy(), out=out.numpy())


def _import_reference_modules():
    # The reference imports lmdb and torchvision which are absent in this image;
    # stub them (fixture generation only touches numerics code paths).
    if "lmdb" not in sys.modules:
        sys.modules["lmdb"] = types.ModuleType("lmdb")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    sys.path.insert(0, os.path.join(REF, "codes"))
    import data.util as ref_data_util
    import utils.util as ref_utils_util

    return ref_data_util, ref_utils_util


def main():
    os.makedirs(GOLDEN, exist_ok=True)
    ref_data, ref_utils = _import_reference_modules()
    rng = np.random.RandomState(0)

    # --- bicubic resize goldens over assorted sizes / scales ---
    cases = []
    for h, w, scale in [
        (37, 53, 0.25),
        (64, 48, 0.25),
        (40, 40, 0.5),
        (33, 29, 1 / 3),
        (24, 31, 2.0),
        (17, 23, 4.0),
        (128, 128, 0.25),
        (12, 15, 0.3),
    ]:
        img = rng.rand(h, w, 3).astype(np.float32)
        out = ref_data.imresize_np(img.copy(), scale, antialiasing=True)
        cases.append((img, np.float64(scale), out))
    np.savez_compressed(
        os.path.join(GOLDEN, "bicubic.npz"),
        **{f"in_{i}": c[0] for i, c in enumerate(cases)},
        **{f"scale_{i}": c[1] for i, c in enumerate(cases)},
        **{f"out_{i}": c[2] for i, c in enumerate(cases)},
        n=np.int64(len(cases)),
    )

    # no-antialias variant (upscale path uses plain kernel anyway; check downscale)
    img = rng.rand(41, 47, 3).astype(np.float32)
    out = ref_data.imresize_np(img.copy(), 0.25, antialiasing=False)
    np.savez_compressed(os.path.join(GOLDEN, "bicubic_noaa.npz"), inp=img, out=out)

    # --- colour conversion goldens ---
    imgf = rng.rand(31, 27, 3).astype(np.float32)
    imgu = (rng.rand(31, 27, 3) * 255).astype(np.uint8)
    np.savez_compressed(
        os.path.join(GOLDEN, "color.npz"),
        imgf=imgf,
        imgu=imgu,
        rgb2y_f=ref_data.rgb2ycbcr(imgf.copy(), only_y=True),
        rgb2ycc_f=ref_data.rgb2ycbcr(imgf.copy(), only_y=False),
        rgb2y_u=ref_data.rgb2ycbcr(imgu.copy(), only_y=True),
        bgr2y_f=ref_data.bgr2ycbcr(imgf.copy(), only_y=True),
        bgr2ycc_u=ref_data.bgr2ycbcr(imgu.copy(), only_y=False),
        ycbcr2rgb_f=ref_data.ycbcr2rgb(imgf.copy()),
        ycbcr2rgb_u=ref_data.ycbcr2rgb(imgu.copy()),
    )

    # --- PSNR / SSIM goldens ---
    a = (rng.rand(96, 80, 3) * 255).astype(np.float64)
    noise = rng.randn(96, 80, 3) * 8.0
    b = np.clip(a + noise, 0, 255)
    a_gray = a[:, :, 0]
    b_gray = b[:, :, 0]
    np.savez_compressed(
        os.path.join(GOLDEN, "metrics.npz"),
        a=a,
        b=b,
        psnr=np.float64(ref_utils.calculate_psnr(a, b)),
        ssim_rgb=np.float64(ref_utils.calculate_ssim(a, b)),
        psnr_gray=np.float64(ref_utils.calculate_psnr(a_gray, b_gray)),
        ssim_gray=np.float64(ref_utils.calculate_ssim(a_gray, b_gray)),
    )

    _make_rrdb_goldens()
    _make_discriminator_goldens()
    _make_vgg_goldens()

    print("goldens written to", GOLDEN)


def _make_discriminator_goldens(size: int = 128, out_dir=None):
    """Golden logits + BN running-stat trajectory from the reference
    D_VGG_{96,128,192} (``architecture.py:87-270``).

    base_nf must be 64: the reference classifiers hard-code the 512-channel
    flatten (Linear(512*4*4, 100) etc., ``architecture.py:126,216,266``), so
    any other width crashes upstream. The ~58 MB fixtures therefore go to the
    gitignored cache dir, generated on demand.
    """
    import torch

    _import_reference_modules()
    sys.path.insert(0, os.path.join(REF, "codes"))
    import models.modules.architecture as codes_arch

    out_dir = out_dir or CACHE
    os.makedirs(out_dir, exist_ok=True)
    torch.manual_seed(21)
    cls = getattr(codes_arch, f"Discriminator_VGG_{size}")
    net = cls(in_nc=3, base_nf=64, norm_type="batch")
    x0 = torch.rand(2, 3, size, size)
    x1 = torch.rand(2, 3, size, size)
    x2 = torch.rand(2, 3, size, size)
    net.train()
    with torch.no_grad():
        logits_train0 = net(x0)  # batch-stat forward; also updates running stats
        net(x1)
        net(x2)
    net.eval()
    with torch.no_grad():
        logits_eval = net(x0)
    torch.save(net.state_dict(), os.path.join(out_dir, f"d_vgg{size}.pth"))
    np.savez_compressed(
        os.path.join(out_dir, f"d_vgg{size}_io.npz"),
        x0=x0.numpy(), x1=x1.numpy(), x2=x2.numpy(),
        logits_train0=logits_train0.numpy(),
        logits_eval=logits_eval.numpy(),
    )


def _make_vgg_goldens():
    """Synthetic torchvision-format VGG19 features (random weights) + reference
    forward through the truncated [:35] stack with ImageNet normalisation."""
    import torch
    import torch.nn as nn

    # Width-reduced VGG19 layout (÷8): validates plan expansion / indices /
    # pooling semantics without an 80 MB fixture.
    layout = (8, 8, "M", 16, 16, "M", 32, 32, 32, 32, "M",
              64, 64, 64, 64, "M", 64, 64, 64, 64, "M")
    torch.manual_seed(33)
    mods, cin = [], 3
    for item in layout:
        if item == "M":
            mods.append(nn.MaxPool2d(2, 2))
        else:
            mods.append(nn.Conv2d(cin, item, 3, 1, 1))
            mods.append(nn.ReLU(inplace=False))
            cin = item
    features = nn.Sequential(*mods)
    truncated = nn.Sequential(*list(features.children())[:35]).eval()
    sd = {f"features.{k}": v for k, v in features.state_dict().items()}
    torch.save(sd, os.path.join(GOLDEN, "vgg19_random.pth"))

    x = torch.rand(1, 3, 96, 96)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        feat = truncated((x - mean) / std)
    np.savez_compressed(
        os.path.join(GOLDEN, "vgg19_io.npz"), x=x.numpy(), feat=feat.numpy())


def _import_test_image_arch():
    """Import the reference's standalone inference arch (test_image/)."""
    import torch

    sys.path.insert(0, os.path.join(REF, "test_image"))
    import block as ref_block

    # The reference pins its noise seed tensor to CUDA (test_image/block.py:148);
    # patch for CPU-only fixture generation (noise is inert in eval mode anyway).
    def _cpu_init(self, sigma=0.1, is_relative_detach=False):
        torch.nn.Module.__init__(self)
        self.sigma = sigma
        self.is_relative_detach = is_relative_detach
        self.noise = torch.tensor(0, dtype=torch.float)

    ref_block.GaussianNoise.__init__ = _cpu_init
    import architecture as ref_arch

    return ref_arch


def _make_rrdb_goldens():
    import torch

    ref_arch = _import_test_image_arch()
    torch.manual_seed(7)

    # Small ESRGAN+ net, ×4 (two upconv stages).
    net = ref_arch.RRDB_Net(3, 3, 32, 3, gc=16, upscale=4).eval()
    torch.save(net.state_dict(), os.path.join(GOLDEN, "rrdb_small_x4.pth"))
    x = torch.rand(1, 3, 16, 12)
    with torch.no_grad():
        y = net(x)
    np.savez_compressed(
        os.path.join(GOLDEN, "rrdb_small_x4_io.npz"),
        x=x.numpy(),
        y=y.numpy(),
    )

    # ×2 variant (single upconv stage) exercises the flattened-index key layout.
    torch.manual_seed(11)
    net2 = ref_arch.RRDB_Net(3, 3, 24, 2, gc=12, upscale=2).eval()
    torch.save(net2.state_dict(), os.path.join(GOLDEN, "rrdb_small_x2.pth"))
    x2 = torch.rand(2, 3, 9, 11)
    with torch.no_grad():
        y2 = net2(x2)
    np.savez_compressed(
        os.path.join(GOLDEN, "rrdb_small_x2_io.npz"),
        x=x2.numpy(),
        y=y2.numpy(),
    )

    # SRResNet ×4 (pixel-shuffle upsampling, relu)
    sys.path.insert(0, os.path.join(REF, "codes"))
    if "torchvision" not in sys.modules:
        _import_reference_modules()
    import models.modules.architecture as codes_arch

    torch.manual_seed(13)
    srres = codes_arch.SRResNet(in_nc=3, out_nc=3, nf=16, nb=2, upscale=4,
                                norm_type=None, act_type="relu",
                                mode="CNA", upsample_mode="pixelshuffle").eval()
    torch.save(srres.state_dict(), os.path.join(GOLDEN, "srresnet_small_x4.pth"))
    xs = torch.rand(1, 3, 12, 10)
    with torch.no_grad():
        ys = srres(xs)
    np.savez_compressed(os.path.join(GOLDEN, "srresnet_small_x4_io.npz"),
                        x=xs.numpy(), y=ys.numpy())

    # Vanilla-ESRGAN style checkpoint: no conv1x1 keys. Golden output = the same
    # net with conv1x1 weights zeroed (the mathematically-intended vanilla graph).
    sd = {k: v for k, v in net.state_dict().items() if "conv1x1" not in k}
    torch.save(sd, os.path.join(GOLDEN, "rrdb_small_x4_vanilla.pth"))
    with torch.no_grad():
        for name, p in net.named_parameters():
            if "conv1x1" in name:
                p.zero_()
        y_vanilla = net(x)
    np.savez_compressed(
        os.path.join(GOLDEN, "rrdb_small_x4_vanilla_io.npz"),
        x=x.numpy(),
        y=y_vanilla.numpy(),
    )


def make_transfer_sft_golden():
    """Key-mapping golden for ``transfer_params --sft``, produced by EXECUTING
    the reference script (``codes/scripts/transfer_params_sft.py``) on a tiny
    tagged SRGAN checkpoint: torch.load/save are patched so the script's
    hard-coded paths resolve to in-memory dicts, every source tensor carries a
    unique value, and the captured output is inverted into {dst_key: src_key}.
    The template dict is empty, so the script's re-init loop is a no-op and
    only its explicit key assignments land in the capture."""
    import json

    import torch

    src_names = ["model.0"]
    for i in range(16):
        src_names += [f"model.1.sub.{i}.res.0", f"model.1.sub.{i}.res.2"]
    src_names += ["model.1.sub.16", "model.2", "model.5", "model.8", "model.10"]
    src = {}
    for name in src_names:
        for suffix in (".weight", ".bias"):
            src[name + suffix] = torch.tensor([float(len(src) + 1)])

    captured = {}
    real_load, real_save = torch.load, torch.save
    torch.load = lambda path, *a, **k: src if "SRGAN" in str(path) else {}
    torch.save = lambda obj, path, *a, **k: captured.update(obj)
    try:
        script = os.path.join(REF, "codes", "scripts", "transfer_params_sft.py")
        with open(script) as f:
            exec(compile(f.read(), script, "exec"), {"__name__": "__main__"})
    finally:
        torch.load, torch.save = real_load, real_save

    val_to_src = {float(v): k for k, v in src.items()}
    mapping = {k: val_to_src[float(v)] for k, v in captured.items()}
    with open(os.path.join(GOLDEN, "transfer_sft_map.json"), "w") as f:
        json.dump(mapping, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
    make_transfer_sft_golden()


def ensure_sn_goldens() -> bool:
    if os.path.exists(os.path.join(CACHE, "d_sn_io.npz")):
        return True
    if not os.path.isdir(REF):
        return False
    _make_sn_goldens()
    return True


def _make_sn_goldens():
    import torch

    _import_reference_modules()
    sys.path.insert(0, os.path.join(REF, "codes"))
    import models.modules.architecture as codes_arch

    os.makedirs(CACHE, exist_ok=True)
    torch.manual_seed(61)
    net = codes_arch.Discriminator_VGG_128_SN()
    x = torch.rand(2, 3, 128, 128)
    net.train()
    with torch.no_grad():
        # save BEFORE the forward: the SN hook mutates weight_u in place
        torch.save(net.state_dict(), os.path.join(CACHE, "d_sn.pth"))
        y = net(x)
    np.savez_compressed(os.path.join(CACHE, "d_sn_io.npz"), x=x.numpy(), y=y.numpy())
