"""SRResNet generator (reference ``codes/models/modules/architecture.py:13-44``).

fea_conv → [nb × EDSR-style ResNetBlock] + LR_conv with long skip → pixel-shuffle
upsampling → HR convs. Blocks are parameter-stacked and scanned like the RRDB
trunk. Default activation is relu (``networks.py:90``), no norm in the shipped
configs.

Torch key layout (flattened ``B.sequential``, same rules as RRDBNet):
``model.0`` fea_conv; ``model.1.sub.{n}.res.{0,2}`` the two block convs;
``model.1.sub.{nb}`` LR_conv; then per ×2 stage [conv, PixelShuffle, act] at
``model.{2,5,…}``; HR_conv0/HR_conv1 at the tail (cross-checked against
``codes/scripts/transfer_params.py:15-20`` which uses model.5/8/10 for nb=16 ×4).
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from esrganplus_tpu.models.layers import Params, act, conv2d, kaiming_conv_init, pixel_shuffle


@dataclasses.dataclass(frozen=True)
class SRResNetConfig:
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    upscale: int = 4
    act_type: str = "relu"
    res_scale: float = 1.0
    unroll: int = 1

    @property
    def n_upscale_stages(self) -> int:
        if self.upscale == 3:
            return 1
        return int(round(math.log2(self.upscale))) if self.upscale > 1 else 0


def init_srresnet(key, cfg: SRResNetConfig, init_scale: float = 1.0, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 5 + cfg.n_upscale_stages)
    block_keys = jax.random.split(keys[0], cfg.nb * 2).reshape(cfg.nb, 2, -1)

    def one_block(ks):
        return {
            "conv0": kaiming_conv_init(ks[0], 3, 3, cfg.nf, cfg.nf, init_scale, dtype=dtype),
            "conv1": kaiming_conv_init(ks[1], 3, 3, cfg.nf, cfg.nf, init_scale, dtype=dtype),
        }

    trunk = jax.vmap(one_block)(block_keys)
    r = 3 if cfg.upscale == 3 else 2
    return {
        "fea_conv": kaiming_conv_init(keys[1], 3, 3, cfg.in_nc, cfg.nf, init_scale, dtype=dtype),
        "trunk": trunk,
        "trunk_conv": kaiming_conv_init(keys[2], 3, 3, cfg.nf, cfg.nf, init_scale, dtype=dtype),
        "upconvs": [
            kaiming_conv_init(keys[5 + i], 3, 3, cfg.nf, cfg.nf * r * r, init_scale, dtype=dtype)
            for i in range(cfg.n_upscale_stages)
        ],
        "hr_conv0": kaiming_conv_init(keys[3], 3, 3, cfg.nf, cfg.nf, init_scale, dtype=dtype),
        "hr_conv1": kaiming_conv_init(keys[4], 3, 3, cfg.nf, cfg.out_nc, init_scale, dtype=dtype),
    }


def srresnet_forward(params: Params, x: jnp.ndarray, cfg: SRResNetConfig,
                     dtype=None) -> jnp.ndarray:
    a = lambda t: act(t, cfg.act_type)
    fea = conv2d(x, params["fea_conv"], dtype=dtype)

    def body(h, block):
        res = conv2d(a(conv2d(h, block["conv0"], dtype=dtype)), block["conv1"], dtype=dtype)
        return h + res * cfg.res_scale, None

    trunk, _ = jax.lax.scan(body, fea, params["trunk"], unroll=cfg.unroll)
    fea = fea + conv2d(trunk, params["trunk_conv"], dtype=dtype)

    r = 3 if cfg.upscale == 3 else 2
    for up in params["upconvs"]:
        fea = a(pixel_shuffle(conv2d(fea, up, dtype=dtype), r))
    fea = a(conv2d(fea, params["hr_conv0"], dtype=dtype))
    return conv2d(fea, params["hr_conv1"], dtype=dtype).astype(jnp.float32)


# ---------------------------------------------------------------------------
# torch .pth conversion
# ---------------------------------------------------------------------------

_TOP = re.compile(r"^model\.(\d+)\.weight$")


def srresnet_from_state_dict(sd: Dict[str, np.ndarray], cfg: SRResNetConfig | None = None,
                             dtype=jnp.float32):
    from esrganplus_tpu.convert.pth import _oihw_to_hwio  # shared transpose

    nb = 1 + max(int(m.group(1)) for k in sd
                 if (m := re.match(r"^model\.1\.sub\.(\d+)\.res", k)))
    if cfg is None:
        nf = sd["model.0.weight"].shape[0]
        in_nc = sd["model.0.weight"].shape[1]
        top = sorted({int(m.group(1)) for k in sd if (m := _TOP.match(k)) and int(m.group(1)) >= 2})
        n_up = len(top) - 2
        out_nc = sd[f"model.{top[-1]}.weight"].shape[0]
        cfg = SRResNetConfig(in_nc=in_nc, out_nc=out_nc, nf=nf, nb=nb, upscale=2 ** n_up)

    def conv(prefix):
        return {
            "w": jnp.asarray(_oihw_to_hwio(sd[prefix + ".weight"]), dtype),
            "b": jnp.asarray(sd[prefix + ".bias"], dtype),
        }

    trunk = {
        "conv0": {"w": [], "b": []},
        "conv1": {"w": [], "b": []},
    }
    for n in range(cfg.nb):
        c0 = conv(f"model.1.sub.{n}.res.0")
        c1 = conv(f"model.1.sub.{n}.res.2")
        trunk["conv0"]["w"].append(c0["w"])
        trunk["conv0"]["b"].append(c0["b"])
        trunk["conv1"]["w"].append(c1["w"])
        trunk["conv1"]["b"].append(c1["b"])
    trunk = {
        name: {leaf: jnp.stack(vals) for leaf, vals in sub.items()}
        for name, sub in trunk.items()
    }

    top = sorted({int(m.group(1)) for k in sd if (m := _TOP.match(k)) and int(m.group(1)) >= 2})
    params = {
        "fea_conv": conv("model.0"),
        "trunk": trunk,
        "trunk_conv": conv(f"model.1.sub.{cfg.nb}"),
        "upconvs": [conv(f"model.{i}") for i in top[:-2]],
        "hr_conv0": conv(f"model.{top[-2]}"),
        "hr_conv1": conv(f"model.{top[-1]}"),
    }
    return params, cfg


def srresnet_to_state_dict(params, cfg: SRResNetConfig) -> Dict[str, np.ndarray]:
    """Export params → reference-layout state dict (indices per module docstring)."""
    from esrganplus_tpu.convert.pth import _hwio_to_oihw

    sd: Dict[str, np.ndarray] = {}

    def put(prefix, p):
        sd[prefix + ".weight"] = _hwio_to_oihw(np.asarray(p["w"], np.float32))
        sd[prefix + ".bias"] = np.asarray(p["b"], np.float32)

    put("model.0", params["fea_conv"])
    for n in range(cfg.nb):
        put(f"model.1.sub.{n}.res.0",
            {k: params["trunk"]["conv0"][k][n] for k in ("w", "b")})
        put(f"model.1.sub.{n}.res.2",
            {k: params["trunk"]["conv1"][k][n] for k in ("w", "b")})
    put(f"model.1.sub.{cfg.nb}", params["trunk_conv"])
    idx = 2
    for up in params["upconvs"]:
        put(f"model.{idx}", up)
        idx += 3  # conv, PixelShuffle, act
    put(f"model.{idx}", params["hr_conv0"])
    put(f"model.{idx + 2}", params["hr_conv1"])
    return sd
