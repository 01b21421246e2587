"""SFT-GAN: spatial-feature-transform SR conditioned on segmentation maps.

Rebuild of the reference SFT family (``codes/models/modules/sft_arch.py``):

  * :class:`SFTLayer` — seg-conditioned affine modulation
    ``fea * (scale+1) + shift`` with 1×1 cond convs and lrelu(0.1)
    (``sft_arch.py:8-20``); the torch-legacy variant uses ``fea*scale + shift``
    and lrelu(0.01) (``sft_arch.py:150-162``) — selected by ``legacy``;
  * :class:`SFTNetConfig` — conv0 → 16 SFT resblocks (parameter-stacked, run
    under ``lax.scan``) → final SFT + conv with long skip → ×4 pixel-shuffle HR
    branch; CondNet compresses the 8-class HR seg map ×4 with a stride-4 conv
    and four 1×1s (``sft_arch.py:40-83``);
  * :func:`acd_forward` — ACD_VGG_BN_96 auxiliary-classifier discriminator:
    BN pyramid to 512×6×6 with lrelu(0.1), two linear heads (gan 1, cls 8)
    (``sft_arch.py:87-142``).

Converters map the torch key layout both ways (NCHW flatten order preserved for
the linear heads).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from esrganplus_tpu.models.layers import (
    Params,
    act,
    batchnorm,
    batchnorm_init,
    conv2d,
    kaiming_conv_init,
    kaiming_linear_init,
    linear,
    pixel_shuffle,
)


@dataclasses.dataclass(frozen=True)
class SFTNetConfig:
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    cond_in: int = 8  # seg classes
    cond_nf: int = 32
    legacy: bool = False  # torch-version SFT semantics
    unroll: int = 1
    upscale: int = 4  # fixed ×4 HR branch (two pixel-shuffle stages)

    @property
    def sft_slope(self) -> float:
        return 0.01 if self.legacy else 0.1


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_sft_layer(key, cfg: SFTNetConfig, dtype) -> Params:
    ks = jax.random.split(key, 4)
    c = cfg.cond_nf
    return {
        "scale0": kaiming_conv_init(ks[0], 1, 1, c, c, dtype=dtype),
        "scale1": kaiming_conv_init(ks[1], 1, 1, c, cfg.nf, dtype=dtype),
        "shift0": kaiming_conv_init(ks[2], 1, 1, c, c, dtype=dtype),
        "shift1": kaiming_conv_init(ks[3], 1, 1, c, cfg.nf, dtype=dtype),
    }


def _init_sft_resblock(key, cfg: SFTNetConfig, dtype) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "sft0": _init_sft_layer(ks[0], cfg, dtype),
        "conv0": kaiming_conv_init(ks[1], 3, 3, cfg.nf, cfg.nf, dtype=dtype),
        "sft1": _init_sft_layer(ks[2], cfg, dtype),
        "conv1": kaiming_conv_init(ks[3], 3, 3, cfg.nf, cfg.nf, dtype=dtype),
    }


def init_sftnet(key, cfg: SFTNetConfig = SFTNetConfig(), dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 16)
    blocks = jax.vmap(lambda k: _init_sft_resblock(k, cfg, dtype))(
        jax.random.split(keys[0], cfg.nb))
    nf = cfg.nf
    return {
        "conv0": kaiming_conv_init(keys[1], 3, 3, cfg.in_nc, nf, dtype=dtype),
        "blocks": blocks,
        "final_sft": _init_sft_layer(keys[2], cfg, dtype),
        "final_conv": kaiming_conv_init(keys[3], 3, 3, nf, nf, dtype=dtype),
        "hr": {
            "up0": kaiming_conv_init(keys[4], 3, 3, nf, nf * 4, dtype=dtype),
            "up1": kaiming_conv_init(keys[5], 3, 3, nf, nf * 4, dtype=dtype),
            "conv0": kaiming_conv_init(keys[6], 3, 3, nf, nf, dtype=dtype),
            "conv1": kaiming_conv_init(keys[7], 3, 3, nf, cfg.out_nc, dtype=dtype),
        },
        "cond": {
            "c0": kaiming_conv_init(keys[8], 4, 4, cfg.cond_in, 128, dtype=dtype),
            "c1": kaiming_conv_init(keys[9], 1, 1, 128, 128, dtype=dtype),
            "c2": kaiming_conv_init(keys[10], 1, 1, 128, 128, dtype=dtype),
            "c3": kaiming_conv_init(keys[11], 1, 1, 128, 128, dtype=dtype),
            "c4": kaiming_conv_init(keys[12], 1, 1, 128, cfg.cond_nf, dtype=dtype),
        },
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _sft_layer(fea, cond, p: Params, cfg: SFTNetConfig, dtype):
    s = cfg.sft_slope
    scale = conv2d(act(conv2d(cond, p["scale0"], dtype=dtype), "leakyrelu", s),
                   p["scale1"], dtype=dtype)
    shift = conv2d(act(conv2d(cond, p["shift0"], dtype=dtype), "leakyrelu", s),
                   p["shift1"], dtype=dtype)
    if cfg.legacy:
        return fea * scale + shift
    return fea * (scale + 1.0) + shift


def sftnet_forward(params: Params, img: jnp.ndarray, seg: jnp.ndarray,
                   cfg: SFTNetConfig = SFTNetConfig(), dtype=None) -> jnp.ndarray:
    """img: [B, h, w, 3] LR; seg: [B, 4h, 4w, 8] HR one-hot seg → [B, 4h, 4w, 3]."""
    c = params["cond"]
    cond = conv2d(seg, c["c0"], stride=4, pad="valid", dtype=dtype)
    for name in ("c1", "c2", "c3"):
        cond = conv2d(act(cond, "leakyrelu", 0.1), c[name], dtype=dtype)
    cond = conv2d(act(cond, "leakyrelu", 0.1), c["c4"], dtype=dtype)

    fea0 = conv2d(img, params["conv0"], dtype=dtype)

    def body(fea, block):
        h = _sft_layer(fea, cond, block["sft0"], cfg, dtype)
        h = act(conv2d(h, block["conv0"], dtype=dtype), "relu")
        h = _sft_layer(h, cond, block["sft1"], cfg, dtype)
        h = conv2d(h, block["conv1"], dtype=dtype)
        return fea + h, None

    fea, _ = jax.lax.scan(body, fea0, params["blocks"], unroll=cfg.unroll)
    fea = _sft_layer(fea, cond, params["final_sft"], cfg, dtype)
    res = conv2d(fea, params["final_conv"], dtype=dtype)
    fea = fea0 + res

    hr = params["hr"]
    fea = act(pixel_shuffle(conv2d(fea, hr["up0"], dtype=dtype), 2), "relu")
    fea = act(pixel_shuffle(conv2d(fea, hr["up1"], dtype=dtype), 2), "relu")
    fea = act(conv2d(fea, hr["conv0"], dtype=dtype), "relu")
    return conv2d(fea, hr["conv1"], dtype=dtype).astype(jnp.float32)


# ---------------------------------------------------------------------------
# ACD discriminator (auxiliary classifier, 96×96)
# ---------------------------------------------------------------------------

_ACD_PLAN = [  # (kernel, stride, cout, bn)
    (3, 1, 64, False), (4, 2, 64, True),
    (3, 1, 128, True), (4, 2, 128, True),
    (3, 1, 256, True), (4, 2, 256, True),
    (3, 1, 512, True), (4, 2, 512, True),
]


def init_acd(key, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, len(_ACD_PLAN) + 4)
    convs, bns = [], []
    cin = 3
    for i, (k, s, cout, bn) in enumerate(_ACD_PLAN):
        convs.append(kaiming_conv_init(keys[i], k, k, cin, cout, dtype=dtype))
        bns.append(batchnorm_init(cout, dtype) if bn else None)
        cin = cout
    return {
        "convs": convs,
        "bn": bns,
        "gan0": kaiming_linear_init(keys[-4], 512 * 6 * 6, 100, dtype=dtype),
        "gan1": kaiming_linear_init(keys[-3], 100, 1, dtype=dtype),
        "cls0": kaiming_linear_init(keys[-2], 512 * 6 * 6, 100, dtype=dtype),
        "cls1": kaiming_linear_init(keys[-1], 100, 8, dtype=dtype),
    }


def acd_forward(params: Params, x: jnp.ndarray, train: bool = False, dtype=None):
    """x: [B, 96, 96, 3] → (gan_logits [B,1], cls_logits [B,8], bn_updates)."""
    h = x
    updates = []
    for p, bn, (k, s, cout, has_bn) in zip(params["convs"], params["bn"], _ACD_PLAN):
        h = conv2d(h, p, stride=s, pad=("same" if k == 3 else 1), dtype=dtype)
        if has_bn:
            h, upd = batchnorm(h, bn, train)
            updates.append(upd)
        else:
            updates.append(None)
        h = act(h, "leakyrelu", 0.1)
    b = h.shape[0]
    h = jnp.transpose(h, (0, 3, 1, 2)).reshape(b, -1)  # NCHW flatten order
    gan = linear(act(linear(h, params["gan0"], dtype=dtype), "leakyrelu", 0.1), params["gan1"], dtype=dtype)
    cls = linear(act(linear(h, params["cls0"], dtype=dtype), "leakyrelu", 0.1), params["cls1"], dtype=dtype)
    return gan.astype(jnp.float32), cls.astype(jnp.float32), updates


def acd_apply_updates(params: Params, updates) -> Params:
    out = dict(params)
    out["bn"] = [
        ({**bn, **upd} if (bn is not None and upd is not None) else bn)
        for bn, upd in zip(params["bn"], updates)
    ]
    return out


# ---------------------------------------------------------------------------
# torch .pth conversion (SFT_Net layout: sft_branch.{0..15} resblocks, 16 = final
# SFT, 17 = final conv; HR_branch indices 0,3,6,8; CondNet 0,2,4,6,8)
# ---------------------------------------------------------------------------


def _conv_t(sd, prefix, dtype):
    return {
        "w": jnp.asarray(np.transpose(sd[prefix + ".weight"], (2, 3, 1, 0)), dtype),
        "b": jnp.asarray(sd[prefix + ".bias"], dtype),
    }


def sftnet_from_state_dict(sd: Dict[str, np.ndarray], cfg: SFTNetConfig = SFTNetConfig(),
                           dtype=jnp.float32) -> Tuple[Params, SFTNetConfig]:
    """Returns ``(params, cfg)`` — cfg is corrected to the checkpoint's
    inferred depth, so callers must not keep using the one they passed in."""
    # Infer depth from the branch keys: indices 0..nb-1 are resblocks, nb the
    # final SFT layer, nb+1 the final conv.
    max_idx = max(int(k.split(".")[1]) for k in sd if k.startswith("sft_branch."))
    nb = max_idx - 1
    if nb != cfg.nb:
        cfg = dataclasses.replace(cfg, nb=nb)

    def sft_layer(prefix):
        return {
            "scale0": _conv_t(sd, prefix + ".SFT_scale_conv0", dtype),
            "scale1": _conv_t(sd, prefix + ".SFT_scale_conv1", dtype),
            "shift0": _conv_t(sd, prefix + ".SFT_shift_conv0", dtype),
            "shift1": _conv_t(sd, prefix + ".SFT_shift_conv1", dtype),
        }

    per_block = [
        {
            "sft0": sft_layer(f"sft_branch.{i}.sft0"),
            "conv0": _conv_t(sd, f"sft_branch.{i}.conv0", dtype),
            "sft1": sft_layer(f"sft_branch.{i}.sft1"),
            "conv1": _conv_t(sd, f"sft_branch.{i}.conv1", dtype),
        }
        for i in range(cfg.nb)
    ]
    blocks = jax.tree.map(lambda *xs: jnp.stack(xs), *per_block)
    return {
        "conv0": _conv_t(sd, "conv0", dtype),
        "blocks": blocks,
        "final_sft": sft_layer(f"sft_branch.{cfg.nb}"),
        "final_conv": _conv_t(sd, f"sft_branch.{cfg.nb + 1}", dtype),
        "hr": {
            "up0": _conv_t(sd, "HR_branch.0", dtype),
            "up1": _conv_t(sd, "HR_branch.3", dtype),
            "conv0": _conv_t(sd, "HR_branch.6", dtype),
            "conv1": _conv_t(sd, "HR_branch.8", dtype),
        },
        "cond": {f"c{i}": _conv_t(sd, f"CondNet.{2 * i}", dtype) for i in range(5)},
    }, cfg


def sftnet_to_state_dict(params: Params, cfg: SFTNetConfig = SFTNetConfig()) -> Dict[str, np.ndarray]:
    """Export params → reference SFT_Net key layout."""
    sd: Dict[str, np.ndarray] = {}

    def put(prefix, p):
        sd[prefix + ".weight"] = np.ascontiguousarray(
            np.transpose(np.asarray(p["w"], np.float32), (3, 2, 0, 1)))
        sd[prefix + ".bias"] = np.asarray(p["b"], np.float32)

    def put_sft(prefix, layer, n=None):
        for ours, theirs in (("scale0", "SFT_scale_conv0"), ("scale1", "SFT_scale_conv1"),
                             ("shift0", "SFT_shift_conv0"), ("shift1", "SFT_shift_conv1")):
            p = layer[ours]
            put(f"{prefix}.{theirs}", {k: (p[k][n] if n is not None else p[k]) for k in p})

    put("conv0", params["conv0"])
    for i in range(cfg.nb):
        blk = params["blocks"]
        put_sft(f"sft_branch.{i}.sft0", blk["sft0"], i)
        put(f"sft_branch.{i}.conv0", {k: blk["conv0"][k][i] for k in blk["conv0"]})
        put_sft(f"sft_branch.{i}.sft1", blk["sft1"], i)
        put(f"sft_branch.{i}.conv1", {k: blk["conv1"][k][i] for k in blk["conv1"]})
    put_sft(f"sft_branch.{cfg.nb}", params["final_sft"])
    put(f"sft_branch.{cfg.nb + 1}", params["final_conv"])
    for ours, theirs in (("up0", "HR_branch.0"), ("up1", "HR_branch.3"),
                         ("conv0", "HR_branch.6"), ("conv1", "HR_branch.8")):
        put(theirs, params["hr"][ours])
    for i in range(5):
        put(f"CondNet.{2 * i}", params["cond"][f"c{i}"])
    return sd


def acd_merge_sequential(params: Params, upd_first, upd_second,
                         momentum: float = 0.9) -> Params:
    """Sequential fold of two ACD BN update lists (see
    discriminator.merge_sequential_bn for the derivation)."""
    out = dict(params)
    out["bn"] = [
        ({k: (momentum * u1[k] + (u2[k] - momentum * bn[k])) for k in ("mean", "var")}
         | {k: bn[k] for k in ("scale", "bias")})
        if (bn is not None and u1 is not None and u2 is not None) else bn
        for bn, u1, u2 in zip(params["bn"], upd_first, upd_second)
    ]
    return out


def acd_from_state_dict(sd: Dict[str, np.ndarray], dtype=jnp.float32) -> Params:
    """torch ``ACD_VGG_BN_96`` state dict → params.

    Reference layout (``sft_arch.py:87-142``): ``feature.N`` Sequential with
    conv at 0 then conv/BN pairs every 3 indices (2/3, 5/6, …, 20/21); heads
    ``gan.{0,2}`` / ``cls.{0,2}`` Linear pairs on the NCHW 512·6·6 flatten."""
    convs, bns = [], []
    idx = 0
    for (_k, _s, _cout, has_bn) in _ACD_PLAN:
        convs.append(_conv_t(sd, f"feature.{idx}", dtype))
        idx += 1
        if has_bn:
            bns.append({
                "scale": jnp.asarray(sd[f"feature.{idx}.weight"], dtype),
                "bias": jnp.asarray(sd[f"feature.{idx}.bias"], dtype),
                "mean": jnp.asarray(sd[f"feature.{idx}.running_mean"], dtype),
                "var": jnp.asarray(sd[f"feature.{idx}.running_var"], dtype),
            })
            idx += 1
        else:
            bns.append(None)
        idx += 1  # in-place LeakyReLU
    params: Params = {"convs": convs, "bn": bns}
    for ours, theirs in (("gan0", "gan.0"), ("gan1", "gan.2"),
                         ("cls0", "cls.0"), ("cls1", "cls.2")):
        params[ours] = {"w": jnp.asarray(np.asarray(sd[f"{theirs}.weight"]).T, dtype),
                        "b": jnp.asarray(sd[f"{theirs}.bias"], dtype)}
    return params


def acd_to_state_dict(params: Params) -> Dict[str, np.ndarray]:
    """Export params → reference ``ACD_VGG_BN_96`` key layout (strict=True
    loadable upstream: includes BN ``num_batches_tracked``)."""
    sd: Dict[str, np.ndarray] = {}
    idx = 0
    for p, bn, (_k, _s, _cout, has_bn) in zip(params["convs"], params["bn"], _ACD_PLAN):
        sd[f"feature.{idx}.weight"] = np.ascontiguousarray(
            np.transpose(np.asarray(p["w"], np.float32), (3, 2, 0, 1)))
        sd[f"feature.{idx}.bias"] = np.asarray(p["b"], np.float32)
        idx += 1
        if has_bn:
            sd[f"feature.{idx}.weight"] = np.asarray(bn["scale"], np.float32)
            sd[f"feature.{idx}.bias"] = np.asarray(bn["bias"], np.float32)
            sd[f"feature.{idx}.running_mean"] = np.asarray(bn["mean"], np.float32)
            sd[f"feature.{idx}.running_var"] = np.asarray(bn["var"], np.float32)
            sd[f"feature.{idx}.num_batches_tracked"] = np.asarray(0, np.int64)
            idx += 1
        idx += 1
    for ours, theirs in (("gan0", "gan.0"), ("gan1", "gan.2"),
                         ("cls0", "cls.0"), ("cls1", "cls.2")):
        sd[f"{theirs}.weight"] = np.ascontiguousarray(
            np.asarray(params[ours]["w"], np.float32).T)
        sd[f"{theirs}.bias"] = np.asarray(params[ours]["b"], np.float32)
    return sd
