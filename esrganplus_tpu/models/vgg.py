"""VGG-19 feature extractor for the perceptual loss (netF).

Reference (``codes/models/modules/architecture.py:279-307``): torchvision VGG19
truncated after layer index ``feature_layer`` (34 = conv5_4 pre-activation; 49 for
the BN variant), ImageNet mean/std normalisation of [0,1] RGB inputs, frozen
weights.

torchvision is not importable in this environment and pretrained weights cannot
be downloaded (zero egress), so weights load from a user-provided ``.pth`` of a
torchvision-format state dict (``features.N.weight``); random init is available
for plumbing tests and clearly flagged by the loader.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from esrganplus_tpu.models.layers import Params, batchnorm, batchnorm_init, conv2d, kaiming_conv_init

# Channels per VGG-19 conv, 'M' = 2×2 maxpool. (Standard VGG-E configuration.)
VGG19_LAYOUT: Tuple = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                       512, 512, 512, 512, "M", 512, 512, 512, 512, "M")

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class VGGFeatConfig:
    feature_layer: int = 34  # torchvision features index to truncate AFTER (exclusive slice end-1)
    use_bn: bool = False
    use_input_norm: bool = True
    # Conv plan; override only for width-reduced test fixtures.
    layout: Tuple = VGG19_LAYOUT
    # early-stage plane kernels (kernels/stage_ct.py) for the ≤128-channel
    # blocks: 'auto' (bf16 on TPU), 'pallas' (forced; interpret on CPU), 'xla'
    stage_kernel: str = "auto"


def _torchvision_plan(cfg: VGGFeatConfig) -> List[tuple]:
    """Expand VGG19_LAYOUT into torchvision `features` entries:
    ('conv', cin, cout) / ('bn', c) / ('relu',) / ('pool',), one per index."""
    plan = []
    cin = 3
    for item in cfg.layout:
        if item == "M":
            plan.append(("pool",))
        else:
            plan.append(("conv", cin, item))
            if cfg.use_bn:
                plan.append(("bn", item))
            plan.append(("relu",))
            cin = item
    return plan


def init_vgg_feat(key, cfg: VGGFeatConfig = VGGFeatConfig(), dtype=jnp.float32) -> Params:
    """Random-init params (plumbing/tests only — not a trained perceptual net)."""
    plan = _torchvision_plan(cfg)[: cfg.feature_layer + 1]
    params: Params = {"layers": [], "pretrained": False}
    k = key
    for entry in plan:
        if entry[0] == "conv":
            k, sub = jax.random.split(k)
            params["layers"].append(kaiming_conv_init(sub, 3, 3, entry[1], entry[2], dtype=dtype))
        elif entry[0] == "bn":
            params["layers"].append(batchnorm_init(entry[1], dtype))
        else:
            params["layers"].append(None)
    return params


def vgg_feat_from_state_dict(sd, cfg: VGGFeatConfig = VGGFeatConfig(), dtype=jnp.float32) -> Params:
    """Convert a torchvision vgg19(_bn) state dict ({'features.N.weight': …})."""
    plan = _torchvision_plan(cfg)[: cfg.feature_layer + 1]
    params: Params = {"layers": [], "pretrained": True}
    for i, entry in enumerate(plan):
        if entry[0] == "conv":
            w = np.transpose(np.asarray(sd[f"features.{i}.weight"]), (2, 3, 1, 0))
            params["layers"].append({
                "w": jnp.asarray(w, dtype),
                "b": jnp.asarray(sd[f"features.{i}.bias"], dtype),
            })
        elif entry[0] == "bn":
            params["layers"].append({
                "scale": jnp.asarray(sd[f"features.{i}.weight"], dtype),
                "bias": jnp.asarray(sd[f"features.{i}.bias"], dtype),
                "mean": jnp.asarray(sd[f"features.{i}.running_mean"], dtype),
                "var": jnp.asarray(sd[f"features.{i}.running_var"], dtype),
            })
        else:
            params["layers"].append(None)
    return params


def load_vgg_feat(path: Optional[str], cfg: VGGFeatConfig = VGGFeatConfig(),
                  dtype=jnp.float32) -> Params:
    """Load from a .pth path if given, else random init (flagged in 'pretrained')."""
    if path:
        from esrganplus_tpu.convert.pth import load_state_dict

        return vgg_feat_from_state_dict(load_state_dict(path), cfg, dtype)
    return init_vgg_feat(jax.random.PRNGKey(0), cfg, dtype)


def _use_pallas_stages(cfg: VGGFeatConfig, dtype, h: int, w: int) -> bool:
    """Gate for running the ≤128-channel early blocks through the plane
    kernels (entry P=4 phases → two pools max). MEASURED DEAD END on v5e
    (round 5, NOTES_ROUND5.md): XLA runs the full VGG19→l34 at 1.26/3.72 ms
    fwd / fwd+bwd(dx) (batch 16, 128², bf16, ≈143 TF/s forward) and the
    plane-kernel early blocks lose at every stripe size (best 1.67/4.52) —
    'auto' therefore resolves to XLA; 'pallas' forces the kernels (kept
    for tests and for hardware where the tradeoff may flip)."""
    del dtype
    if cfg.stage_kernel != "pallas" or cfg.use_bn:
        return False
    return not (h % 4 or w % 4)


def _early_stages_pallas(params: Params, x: jnp.ndarray, plan, dtype):
    """Run the leading conv/relu/pool segment in the transposed plane layout
    (kernels/stage_ct.py). Returns (NHWC activations, #plan entries consumed).
    Stops before the first conv with >128 channels, before a pool that would
    drop below P=1, or at the plan's end (a trailing conv without its relu —
    the feature_layer=34 truncation — runs with act=None)."""
    from esrganplus_tpu.kernels.stage_ct import (
        conv_s1_ct_diff, nhwc_to_planes, pad_rows_planes, pad_w_cin,
        planes_to_nhwc, pool2_planes, prepare_convxp_ct)

    interp = jax.default_backend() == "cpu"
    b, H, W, _ = x.shape
    P = 4
    kdt = dtype if dtype is not None else x.dtype
    planes = None
    hh, ww = H, W // P
    i = 0
    while i < len(plan):
        entry = plan[i]
        if entry[0] == "conv":
            _, cin, cout = entry
            if cout > 128:
                break
            act = ("relu" if i + 1 < len(plan) and plan[i + 1][0] == "relu"
                   else None)
            if planes is None:
                planes = nhwc_to_planes(x.astype(kdt), P)
            p = params["layers"][i]
            w_conv, c_eff = p["w"], cin
            if cin < 8:  # Mosaic needs ≥8 sublanes through the lane shifts
                planes = pad_rows_planes(planes, 8)
                w_conv, c_eff = pad_w_cin(w_conv, 8), 8
            wm, bias = prepare_convxp_ct(w_conv, p["b"], P, dtype=jnp.float32)
            planes = conv_s1_ct_diff(planes, wm, bias, C=c_eff, CO=cout, P=P,
                                     h=hh, w=ww, n_img=b, act=act,
                                     interpret=interp)
            i += 2 if act else 1
        elif entry[0] == "pool":
            if P == 1:
                break
            planes = pool2_planes(planes, b, hh, ww)
            P, hh = P // 2, hh // 2
            i += 1
        else:
            break
    if planes is None:
        return x, 0
    return planes_to_nhwc(planes, b, hh, ww), i


def vgg_feat_forward(params: Params, x: jnp.ndarray, cfg: VGGFeatConfig = VGGFeatConfig(),
                     dtype=None) -> jnp.ndarray:
    """NHWC RGB [0,1] → feature map at the truncation point. Weights are treated
    as frozen (wrap calls in stop_gradient on params if used inside a loss).

    On TPU in bf16 the ≤128-channel early blocks run through the plane-layout
    stage kernels (``kernels/stage_ct.py``; custom-VJP, so the perceptual
    loss backward stays in-kernel); the deep blocks stay on XLA, which is
    already near the MXU roof there (round-5 probe)."""
    if cfg.use_input_norm:
        mean = jnp.asarray(_IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(_IMAGENET_STD, x.dtype)
        x = (x - mean) / std
    plan = _torchvision_plan(cfg)[: cfg.feature_layer + 1]
    h = x
    start = 0
    if _use_pallas_stages(cfg, dtype, x.shape[1], x.shape[2]):
        h, start = _early_stages_pallas(params, x, plan, dtype)
    for entry, p in zip(plan[start:], params["layers"][start:]):
        if entry[0] == "conv":
            h = conv2d(h, p, dtype=dtype)
        elif entry[0] == "bn":
            h, _ = batchnorm(h, p, train=False)
        elif entry[0] == "relu":
            h = jax.nn.relu(h)
        else:  # 2×2 max pool, stride 2 (torch default: floor mode)
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return h
