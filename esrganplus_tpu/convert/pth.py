"""Torch ``.pth`` checkpoint ↔ esrganplus_tpu parameter pytrees.

The reference saves flattened ``nn.Sequential`` state dicts (key layout derived in
SURVEY.md §2.10 from ``codes/models/modules/architecture.py:55-74`` and the
``sequential`` flattening rules ``block.py:95-108``):

    model.0.{weight,bias}                              fea_conv
    model.1.sub.{n}.RDB{k}.conv{1..4}.0.{weight,bias}  dense convs (trailing .0 = conv
                                                       inside a conv+act Sequential)
    model.1.sub.{n}.RDB{k}.conv1x1.weight              ESRGAN+ shortcut (bias-free;
                                                       ABSENT in vanilla ESRGAN ckpts)
    model.1.sub.{n}.RDB{k}.conv5.0.{weight,bias}       fusion conv (also a 1-module
                                                       Sequential → trailing .0)
    model.1.sub.{nb}.{weight,bias}                     LR/trunk conv
    model.{i}.{weight,bias}  (i ≥ 2, conv entries)     upconvs… then HR_conv0, HR_conv1

Weights convert OIHW → HWIO. Our trunk is parameter-stacked for ``lax.scan``, so
per-block tensors are packed along a leading nb axis.

Vanilla-ESRGAN quirk: the reference loads those checkpoints with ``strict=False``
(``test_image/test.py:17``), silently leaving ``conv1x1`` at *random init*. We
default to zeros instead — mathematically identical to the vanilla graph the
checkpoint was trained with — and record the event; ``missing_conv1x1='error'``
makes it fatal.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from esrganplus_tpu.models.rrdb import RRDBNetConfig

__all__ = [
    "load_state_dict",
    "rrdbnet_from_state_dict",
    "rrdbnet_to_state_dict",
    "infer_rrdbnet_config",
    "discriminator_from_state_dict",
    "discriminator_to_state_dict",
]

_RDB_KEY = re.compile(r"^model\.1\.sub\.(\d+)\.RDB(\d)\.(conv\d(?:x\d)?)(?:\.0)?\.(weight|bias)$")
_TOP_KEY = re.compile(r"^model\.(\d+)\.(weight|bias)$")


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint file into {key: numpy array} without needing CUDA."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _hwio_to_oihw(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


def infer_rrdbnet_config(sd: Dict[str, np.ndarray]) -> RRDBNetConfig:
    """Deduce (nb, nf, gc, in/out channels, upscale, conv1x1 presence) from keys."""
    blocks = set()
    has_1x1 = False
    for k in sd:
        m = _RDB_KEY.match(k)
        if m:
            blocks.add(int(m.group(1)))
            if m.group(3) == "conv1x1":
                has_1x1 = True
    nb = max(blocks) + 1 if blocks else 0
    w_fea = sd["model.0.weight"]  # OIHW
    nf, in_nc = w_fea.shape[0], w_fea.shape[1]
    gc = sd["model.1.sub.0.RDB1.conv1.0.weight"].shape[0]  # nb: refs hard-code gc=32
    top = sorted({int(m.group(1)) for k in sd if (m := _TOP_KEY.match(k)) and int(m.group(1)) >= 2})
    n_up = len(top) - 2
    out_nc = sd[f"model.{top[-1]}.weight"].shape[0]
    upscale = 2 ** n_up  # scale-3 nets also have one stage; cannot be told apart
    return RRDBNetConfig(in_nc=in_nc, out_nc=out_nc, nf=nf, nb=nb, gc=gc,
                         upscale=upscale, conv1x1=has_1x1)


def rrdbnet_from_state_dict(
    sd: Dict[str, np.ndarray],
    cfg: RRDBNetConfig | None = None,
    missing_conv1x1: str = "zeros",
    dtype=jnp.float32,
) -> Tuple[dict, RRDBNetConfig, dict]:
    """Convert a reference RRDBNet state dict → (params, cfg, info).

    ``info['missing_conv1x1_blocks']`` lists (block, rdb) pairs that had no 1×1
    weight in the checkpoint (vanilla-ESRGAN case).
    """
    inferred = infer_rrdbnet_config(sd)
    if cfg is None:
        cfg = inferred
    else:
        for f in ("in_nc", "out_nc", "nf", "nb", "gc"):
            a, b = getattr(cfg, f), getattr(inferred, f)
            if a != b:
                raise ValueError(f"checkpoint mismatch: cfg.{f}={a} but checkpoint has {b}")
        if cfg.conv1x1 and not inferred.conv1x1 and missing_conv1x1 == "error":
            raise ValueError("checkpoint has no conv1x1 weights but cfg.conv1x1=True")

    def conv(prefix: str, bias: bool = True) -> dict:
        # conv5 is a one-module Sequential in the reference (its `sequential`
        # helper only collapses when called with a single argument), so its keys
        # carry a trailing ".0"; accept both forms.
        if prefix + ".weight" not in sd and prefix + ".0.weight" in sd:
            prefix = prefix + ".0"
        p = {"w": jnp.asarray(_oihw_to_hwio(sd[prefix + ".weight"]), dtype)}
        if bias:
            p["b"] = jnp.asarray(sd[prefix + ".bias"], dtype)
        return p

    missing = []

    def rdb(n: int, k: int) -> dict:
        base = f"model.1.sub.{n}.RDB{k}"
        p = {
            "conv1": conv(base + ".conv1.0"),
            "conv2": conv(base + ".conv2.0"),
            "conv3": conv(base + ".conv3.0"),
            "conv4": conv(base + ".conv4.0"),
            "conv5": conv(base + ".conv5"),
        }
        if cfg.conv1x1:
            key = base + ".conv1x1.weight"
            if key in sd:
                p["conv1x1"] = {"w": jnp.asarray(_oihw_to_hwio(sd[key]), dtype)}
            else:
                missing.append((n, k))
                p["conv1x1"] = {"w": jnp.zeros((1, 1, cfg.nf, cfg.gc), dtype)}
        return p

    # Stack per-block params along a leading nb axis for lax.scan.
    def stacked(k: int) -> dict:
        per_block = [rdb(n, k) for n in range(cfg.nb)]
        return {
            name: {
                leaf: jnp.stack([blk[name][leaf] for blk in per_block])
                for leaf in per_block[0][name]
            }
            for name in per_block[0]
        }

    trunk = {"rdb1": stacked(1), "rdb2": stacked(2), "rdb3": stacked(3)}

    top = sorted({int(m.group(1)) for k in sd if (m := _TOP_KEY.match(k)) and int(m.group(1)) >= 2})
    params = {
        "fea_conv": conv("model.0"),
        "trunk": trunk,
        "trunk_conv": conv(f"model.1.sub.{cfg.nb}"),
        "upconvs": [conv(f"model.{i}") for i in top[:-2]],
        "hr_conv0": conv(f"model.{top[-2]}"),
        "hr_conv1": conv(f"model.{top[-1]}"),
    }
    return params, cfg, {"missing_conv1x1_blocks": missing}


def rrdbnet_to_state_dict(params: dict, cfg: RRDBNetConfig) -> Dict[str, np.ndarray]:
    """Export params → a reference-layout state dict (for .pth interop: the
    reference's test/interp tools can consume our checkpoints)."""
    sd: Dict[str, np.ndarray] = {}

    def put(prefix: str, p: dict):
        sd[prefix + ".weight"] = _hwio_to_oihw(np.asarray(p["w"], np.float32))
        if "b" in p:
            sd[prefix + ".bias"] = np.asarray(p["b"], np.float32)

    put("model.0", params["fea_conv"])
    for n in range(cfg.nb):
        for k, name in ((1, "rdb1"), (2, "rdb2"), (3, "rdb3")):
            sub = params["trunk"][name]
            base = f"model.1.sub.{n}.RDB{k}"
            for cname in ("conv1", "conv2", "conv3", "conv4", "conv5"):
                put(f"{base}.{cname}.0", {leaf: sub[cname][leaf][n] for leaf in sub[cname]})
            if cfg.conv1x1:
                sd[f"{base}.conv1x1.weight"] = _hwio_to_oihw(
                    np.asarray(sub["conv1x1"]["w"][n], np.float32))
    put(f"model.1.sub.{cfg.nb}", params["trunk_conv"])
    idx = 3
    for up in params["upconvs"]:
        put(f"model.{idx}", up)
        idx += 3
    put(f"model.{idx - 1}", params["hr_conv0"])
    put(f"model.{idx + 1}", params["hr_conv1"])
    return sd


# ---------------------------------------------------------------------------
# Discriminator (VGG-style) conversion
# ---------------------------------------------------------------------------
#
# Reference flattening (architecture.py:87-129 via block.sequential): stage 0
# contributes [conv, act]; every later conv_block contributes [conv, bn, act]
# (or [conv, act] without norm). Classifier = classifier.0 / classifier.2
# Linears. The first Linear acts on a C-major (NCHW) flatten; our forward
# transposes to NCHW before flattening, so Linear weights convert as plain
# transposes.


def _d_plan(cfg):
    """Yield ('a'|'b', stage_idx, has_bn) in flattened feature order."""
    for i in range(cfg.n_stages):
        yield ("a", i, cfg.use_bn and i > 0)
        yield ("b", i, cfg.use_bn)


def discriminator_from_state_dict(sd: Dict[str, np.ndarray], cfg, dtype=jnp.float32) -> dict:
    from esrganplus_tpu.models.discriminator import DiscriminatorVGGConfig  # noqa: F401

    idx = 0
    convs = []
    bns = []
    cur = None
    for side, i, has_bn in _d_plan(cfg):
        p = {
            "w": jnp.asarray(_oihw_to_hwio(sd[f"features.{idx}.weight"]), dtype),
            "b": jnp.asarray(sd[f"features.{idx}.bias"], dtype),
        }
        idx += 1
        bn = None
        if has_bn:
            bn = {
                "scale": jnp.asarray(sd[f"features.{idx}.weight"], dtype),
                "bias": jnp.asarray(sd[f"features.{idx}.bias"], dtype),
                "mean": jnp.asarray(sd[f"features.{idx}.running_mean"], dtype),
                "var": jnp.asarray(sd[f"features.{idx}.running_var"], dtype),
            }
            idx += 1
        idx += 1  # activation slot
        if side == "a":
            cur = {"a": p}
            if cfg.use_bn:
                bns.append({"a": bn})
        else:
            cur["b"] = p
            convs.append(cur)
            if cfg.use_bn:
                bns[-1]["b"] = bn
    params = {
        "convs": convs,
        "fc0": {
            "w": jnp.asarray(sd["classifier.0.weight"].T, dtype),
            "b": jnp.asarray(sd["classifier.0.bias"], dtype),
        },
        "fc1": {
            "w": jnp.asarray(sd["classifier.2.weight"].T, dtype),
            "b": jnp.asarray(sd["classifier.2.bias"], dtype),
        },
    }
    if cfg.use_bn:
        params["bn"] = bns
    return params


def discriminator_to_state_dict(params: dict, cfg) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    idx = 0
    for side, i, has_bn in _d_plan(cfg):
        p = params["convs"][i][side]
        sd[f"features.{idx}.weight"] = _hwio_to_oihw(np.asarray(p["w"], np.float32))
        sd[f"features.{idx}.bias"] = np.asarray(p["b"], np.float32)
        idx += 1
        if has_bn:
            bn = params["bn"][i][side]
            sd[f"features.{idx}.weight"] = np.asarray(bn["scale"], np.float32)
            sd[f"features.{idx}.bias"] = np.asarray(bn["bias"], np.float32)
            sd[f"features.{idx}.running_mean"] = np.asarray(bn["mean"], np.float32)
            sd[f"features.{idx}.running_var"] = np.asarray(bn["var"], np.float32)
            sd[f"features.{idx}.num_batches_tracked"] = np.asarray(0, np.int64)
            idx += 1
        idx += 1
    sd["classifier.0.weight"] = np.asarray(params["fc0"]["w"], np.float32).T
    sd["classifier.0.bias"] = np.asarray(params["fc0"]["b"], np.float32)
    sd["classifier.2.weight"] = np.asarray(params["fc1"]["w"], np.float32).T
    sd["classifier.2.bias"] = np.asarray(params["fc1"]["b"], np.float32)
    return sd


# ---------------------------------------------------------------------------
# Generator-family dispatch
# ---------------------------------------------------------------------------


def generator_from_state_dict(sd: Dict[str, np.ndarray], cfg=None, **kw):
    """Dispatch: RRDBNet checkpoints have RDB keys, SRResNet ones .res keys,
    SFT_Net ones sft_branch keys. Returns (params, cfg, info)."""
    from esrganplus_tpu.models.sft import SFTNetConfig, sftnet_from_state_dict
    from esrganplus_tpu.models.srresnet import SRResNetConfig, srresnet_from_state_dict

    is_sft = (any(k.startswith("sft_branch.") for k in sd)
              or isinstance(cfg, SFTNetConfig))
    if is_sft:
        if cfg is None:
            cfg = SFTNetConfig()
        params, cfg = sftnet_from_state_dict(sd, cfg)
        return params, cfg, {}
    is_srresnet = any(".res.0.weight" in k for k in sd) or isinstance(cfg, SRResNetConfig)
    if is_srresnet:
        params, cfg = srresnet_from_state_dict(sd, cfg)
        return params, cfg, {"missing_conv1x1_blocks": []}
    return rrdbnet_from_state_dict(sd, cfg, **kw)


def generator_to_state_dict(params: dict, cfg) -> Dict[str, np.ndarray]:
    from esrganplus_tpu.models.srresnet import SRResNetConfig, srresnet_to_state_dict

    if isinstance(cfg, SRResNetConfig):
        return srresnet_to_state_dict(params, cfg)
    return rrdbnet_to_state_dict(params, cfg)


def discriminator_sn_to_state_dict(params: dict, cfg) -> Dict[str, np.ndarray]:
    """Inverse of :func:`discriminator_sn_from_state_dict`: the reference SN
    layout ``conv{0..2n-1}.{weight_orig,weight,weight_u,bias}`` +
    ``linear{0,1}.*`` (architecture.py:133-175). ``weight`` is the
    sigma-normalised buffer torch's vendored SN registers alongside the
    parameter (spectral_norm.py:66-74), computed from the stored ``u`` exactly
    as a forward pass leaves it, so reference tools can load strict=True."""

    def put(sd, name, w_store, w2d, b, u):
        u = np.asarray(u, np.float32)
        v = w2d.T @ u
        v = v / (np.linalg.norm(v) + 1e-12)
        sigma = float(u @ (w2d @ v))
        sd[f"{name}.weight_orig"] = w_store
        sd[f"{name}.weight"] = w_store / sigma
        sd[f"{name}.weight_u"] = u
        sd[f"{name}.bias"] = np.asarray(b, np.float32)

    sd: Dict[str, np.ndarray] = {}
    for i in range(cfg.n_stages):
        for j, side in enumerate(("a", "b")):
            p = params["convs"][i][side]
            w = np.asarray(p["w"], np.float32)  # HWIO
            # sigma is invariant to the contraction-column permutation
            # (hwi vs torch's ihw) — see the from_state_dict docstring
            w2d = w.reshape(-1, w.shape[-1]).T
            put(sd, f"conv{2 * i + j}", _hwio_to_oihw(w), w2d, p["b"], p["u"])
    for ours, theirs in (("fc0", "linear0"), ("fc1", "linear1")):
        p = params[ours]
        wt = np.asarray(p["w"], np.float32).T  # [out, in], torch layout
        put(sd, theirs, wt, wt, p["b"], p["u"])
    return sd


def discriminator_sn_from_state_dict(sd: Dict[str, np.ndarray], cfg, dtype=jnp.float32) -> dict:
    """Convert the spectral-norm discriminator (``Discriminator_VGG_128_SN``,
    architecture.py:133-175; vendored SN state: ``weight_orig`` + ``weight_u``).

    The power-iteration u imports directly: our weight matricisation permutes
    the contraction columns relative to torch's (hwi vs ihw order), which leaves
    u, sigma and the normalised weight invariant."""
    def conv(i):
        return {
            "w": jnp.asarray(_oihw_to_hwio(sd[f"conv{i}.weight_orig"]), dtype),
            "b": jnp.asarray(sd[f"conv{i}.bias"], dtype),
            "u": jnp.asarray(sd[f"conv{i}.weight_u"], dtype),
        }

    convs = [{"a": conv(2 * i), "b": conv(2 * i + 1)} for i in range(cfg.n_stages)]
    params = {"convs": convs}
    for ours, theirs in (("fc0", "linear0"), ("fc1", "linear1")):
        params[ours] = {
            "w": jnp.asarray(sd[f"{theirs}.weight_orig"].T, dtype),
            "b": jnp.asarray(sd[f"{theirs}.bias"], dtype),
            "u": jnp.asarray(sd[f"{theirs}.weight_u"], dtype),
        }
    return params
