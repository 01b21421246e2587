"""One-shot super-resolution inference (the reference's ``test_image/test.py`` surface).

Loads reference ``.pth`` checkpoints through the converter and runs the RRDB
generator under ``jit``. Shapes are static under XLA, so the forward is compiled
per input shape and cached; ``pad_multiple`` optionally right/bottom-pads inputs
(edge mode) to a bucket size to bound the number of compilations, trading exact
border parity for fewer recompiles.

Reference behaviour mirrored (``test_image/test.py:26-40``): BGR uint8 on disk →
RGB [0,1] → forward → clamp(0,1) → BGR ×255 rounded PNG named ``<base>_rlt.png``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from esrganplus_tpu.convert import load_state_dict
from esrganplus_tpu.convert.pth import generator_from_state_dict
from esrganplus_tpu.models import RRDBNetConfig, generator_forward
from esrganplus_tpu.ops.image_io import img2tensor, tensor2img


def load_generator(path: str, cfg: Optional[RRDBNetConfig] = None,
                   missing_conv1x1: str = "zeros"):
    """Load a reference RRDBNet ``.pth`` → (params, cfg, info)."""
    sd = load_state_dict(path)
    return generator_from_state_dict(sd, cfg, missing_conv1x1=missing_conv1x1)


class ShardedEvaluator:
    """Batched evaluation sharded over the mesh's ``data`` axis.

    The reference evaluates strictly sequentially at batch 1
    (``codes/test.py:49``); at slice scale a Set5/Set14 sweep should instead
    fill every chip. Differently-sized images are edge-padded to the set's
    max dims (rounded to ``pad_multiple``), the batch is zero-padded to the
    axis size, ONE compiled ``shard_map`` forward is reused for every chunk,
    and each output is cropped back.

    Trade-off (documented, same as SRInferencer.pad_multiple): edge padding
    perturbs convolution borders within the network's effective receptive
    radius of the right/bottom edges, so results are interior-exact but not
    bit-identical to whole-image inference there. Use the sequential path
    when strict border parity matters.
    """

    def __init__(self, cfg, mesh, dtype=None, pad_multiple: int = 8,
                 fwd_fn=None, side_scale: int = 0):
        """``fwd_fn(params, img[, side])`` overrides the default RRDB forward
        (e.g. ``functools.partial(sftnet_forward, cfg=...)`` for SFT-GAN whose
        generator takes a segmentation side input); ``side_scale`` > 0 declares
        that side input, sized ``side_scale``× the LR image (SFT seg maps ride
        at HR scale = ``cfg.upscale``)."""
        from jax.sharding import PartitionSpec as P

        self.cfg = cfg
        self.mesh = mesh
        self.dtype = dtype
        self.pad_multiple = pad_multiple
        self.side_scale = side_scale
        self.ndev = mesh.shape["data"]
        self.calls = 0  # compiled-forward invocations (for tests/telemetry)
        if fwd_fn is None:
            fwd_fn = functools.partial(generator_forward, cfg=cfg, train=False,
                                       dtype=dtype)
        n_in = 2 if side_scale else 1
        self._fwd = jax.jit(jax.shard_map(
            fwd_fn, mesh=mesh, in_specs=(P(),) + (P("data"),) * n_in,
            out_specs=P("data"), check_vma=False))

    def upscale_batch(self, params, images, sides=None) -> list:
        """list of HWC RGB [0,1] arrays (any sizes) → list of float32 SR.

        ``sides``: per-image side-input arrays (HWC, ``side_scale``× the image
        dims), required iff the evaluator was built with ``side_scale``."""
        assert (sides is None) == (self.side_scale == 0)
        s = self.cfg.upscale
        m = self.pad_multiple
        hm = max(i.shape[0] for i in images)
        wm = max(i.shape[1] for i in images)
        hm += (-hm) % m
        wm += (-wm) % m
        c = images[0].shape[2]
        outs = []
        for i0 in range(0, len(images), self.ndev):
            chunk = images[i0:i0 + self.ndev]
            stack = np.zeros((self.ndev, hm, wm, c), np.float32)
            for j, img in enumerate(chunk):
                h, w = img.shape[:2]
                stack[j] = np.pad(img, ((0, hm - h), (0, wm - w), (0, 0)), mode="edge")
            args = [jnp.asarray(stack)]
            if sides is not None:
                r = self.side_scale
                schunk = sides[i0:i0 + self.ndev]
                sstack = np.zeros((self.ndev, hm * r, wm * r, schunk[0].shape[2]),
                                  np.float32)
                for j, sd in enumerate(schunk):
                    sh, sw = sd.shape[:2]
                    sstack[j] = np.pad(sd, ((0, hm * r - sh), (0, wm * r - sw),
                                            (0, 0)), mode="edge")
                args.append(jnp.asarray(sstack))
            y = np.asarray(self._fwd(params, *args), np.float32)
            self.calls += 1
            for j, img in enumerate(chunk):
                h, w = img.shape[:2]
                outs.append(np.clip(y[j, :h * s, :w * s, :], 0.0, 1.0))
        return outs


class SRInferencer:
    """jit-compiled ×scale SR on arbitrary-size images.

    ``dtype=None`` is the fp32 parity path; ``jnp.bfloat16`` the throughput path.
    """

    def __init__(self, params, cfg: RRDBNetConfig, dtype=None, pad_multiple: Optional[int] = None,
                 noise_rng: Optional[jax.Array] = None):
        """``noise_rng`` activates the nESRGAN+/Tarsier noise sites at inference
        with a DETERMINISTIC key (the Tarsier workflow evolves/selects such noise
        realisations per image; reference README.md:6, arXiv:2009.12177). None =
        standard deterministic inference."""
        from esrganplus_tpu.models.rrdb import prep_trunk_ct, prep_trunk_static

        if isinstance(params, dict) and "trunk_ct" not in params \
                and prep_trunk_static(cfg, dtype):
            # keep the trunk weights in the kernel layout once, instead of
            # re-deriving them inside every jitted forward (models/rrdb.py)
            params = prep_trunk_ct(params, cfg)
        self.params = params
        self.cfg = cfg
        self.dtype = dtype
        self.pad_multiple = pad_multiple
        self.noise_active = noise_rng is not None
        if noise_rng is not None:
            self._fwd = jax.jit(functools.partial(
                generator_forward, cfg=cfg, train=True, rng=noise_rng, dtype=dtype))
        else:
            self._fwd = jax.jit(
                functools.partial(generator_forward, cfg=cfg, train=False, dtype=dtype)
            )

    def upscale(self, img_rgb: np.ndarray) -> np.ndarray:
        """HWC (or NHWC) RGB [0,1] float → upscaled float32 RGB, clipped to [0,1]."""
        x = jnp.asarray(img_rgb, jnp.float32)
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        h, w = x.shape[1], x.shape[2]
        ph = pw = 0
        if self.pad_multiple:
            m = self.pad_multiple
            ph, pw = (-h) % m, (-w) % m
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        y = self._fwd(self.params, x)
        s = self.cfg.upscale
        y = y[:, : h * s, : w * s, :]
        y = jnp.clip(y, 0.0, 1.0)
        out = np.asarray(y, np.float32)
        return out[0] if squeeze else out

    def upscale_bgr_to_png(self, img_bgr01: np.ndarray) -> np.ndarray:
        """HWC BGR [0,1] → HWC BGR uint8 result (file-format ready)."""
        rgb = img2tensor(img_bgr01)
        out = self.upscale(rgb)
        return tensor2img(out)

    def upscale_x8(self, img_rgb: np.ndarray, batched: bool = True) -> np.ndarray:
        """Geometric self-ensemble (EDSR-style ``test_x8``, reference
        ``codes/models/SR_model.py:82-120``): average the SR results of the 8
        dihedral transforms of the input, each inverse-transformed back.

        ``batched`` groups the variants by shape — the 4 untransposed and the
        4 transposed ones — into TWO batched forwards (one for square inputs)
        instead of 8 dispatches; same math, same result for the (normal)
        noise-free forward. When the inferencer was built with ``noise_rng``
        (Tarsier workflow: noise sites active at inference), batching would
        change the noise shapes and hence the realisations each variant sees,
        so the per-variant path is forced to keep outputs independent of this
        optimisation."""
        assert img_rgb.ndim == 3
        if self.noise_active:
            batched = False

        def tf(img, op):
            if op == "v":
                return img[:, ::-1, :]
            if op == "h":
                return img[::-1, :, :]
            return img.transpose(1, 0, 2)  # 't'

        variants = [img_rgb]
        for op in ("v", "h", "t"):
            variants.extend(tf(v, op) for v in list(variants))

        if batched:
            srs = [None] * 8
            for group in ((0, 1, 2, 3), (4, 5, 6, 7)):
                stack = np.stack([np.ascontiguousarray(variants[i])
                                  for i in group])
                out = self.upscale(stack)
                for j, i in enumerate(group):
                    srs[i] = out[j]
        else:
            srs = [self.upscale(np.ascontiguousarray(v)) for v in variants]

        outs = []
        for i, y in enumerate(srs):
            # inverse: ops applied in order v(bit0), h(bit1), t(bit2) — undo in reverse
            if i > 3:
                y = y.transpose(1, 0, 2)
            if (i % 4) > 1:
                y = y[::-1, :, :]
            if (i % 2) == 1:
                y = y[:, ::-1, :]
            outs.append(y)
        return np.mean(outs, axis=0)

    def derive_halo(self, eps: float = 1e-3, probe: int = 64, seed: int = 0) -> int:
        """Measure the effective receptive radius of THIS network's weights.

        The RRDB trunk's formal receptive field spans hundreds of pixels
        (5 convs/RDB × 3 RDBs × nb blocks), but the β=0.2 residual scaling
        makes influence decay geometrically, so the *effective* radius is
        small. Measured empirically: perturb one pixel of a random probe
        image and find the largest LR radius where the output still changes
        by more than ``eps`` × the peak response. The returned halo bounds
        single-pixel seam leakage by eps·peak; stitched tiles are NOT
        bit-exact vs whole-image inference, but their error is below
        eps-scale, far under the uint8 quantisation floor for eps=1e-3.

        Cached per (eps, probe); costs two forwards at probe size.
        """
        key = (float(eps), int(probe), int(seed))
        cache = getattr(self, "_halo_cache", {})
        if key in cache:
            return cache[key]
        rng = np.random.RandomState(seed)
        img = rng.rand(probe, probe, 3).astype(np.float32)
        base = self.upscale(img)
        img2 = img.copy()
        c = probe // 2
        img2[c, c, :] = 1.0 - img2[c, c, :]
        diff = np.abs(self.upscale(img2) - base).max(axis=2)
        s = self.cfg.upscale
        peak = float(diff.max())
        ys, xs = np.nonzero(diff > eps * max(peak, 1e-12))
        if len(ys) == 0:
            halo = 4
        else:
            # distance from the perturbed LR pixel's HR footprint, in LR px
            dy = np.maximum(0, np.maximum(c * s - ys, ys - (c * s + s - 1)))
            dx = np.maximum(0, np.maximum(c * s - xs, xs - (c * s + s - 1)))
            halo = int(-(-int(np.maximum(dy, dx).max()) // s)) + 1
        halo = max(4, min(halo, probe // 2 - 1))
        cache[key] = halo
        self._halo_cache = cache
        return halo

    def upscale_tiled(self, img_rgb: np.ndarray, tile: int = 128,
                      halo: Optional[int] = None, tile_batch: int = 8,
                      halo_eps: float = 1e-3) -> np.ndarray:
        """Spatially-tiled SR for images too large for one pass.

        Tiles of ``tile``×``tile`` LR px are forwarded with a ``halo``-px
        overlap and centre-stitched; up to ``tile_batch`` same-shape tiles run
        as ONE batched forward (a single compiled program, MXU kept busy).
        ``halo=None`` derives the receptive-field-safe halo from the actual
        weights via :meth:`derive_halo` (error bound documented there);
        passing an int overrides it.
        """
        if halo is None:
            halo = min(self.derive_halo(eps=halo_eps), max(1, (tile - 2) // 2))
        h, w, c = img_rgb.shape
        s = self.cfg.upscale
        if h <= tile and w <= tile:
            return self.upscale(img_rgb)
        out = np.zeros((h * s, w * s, c), np.float32)
        step = tile - 2 * halo
        assert step > 0, "tile must exceed 2*halo"
        ys = list(range(0, max(h - 2 * halo, 1), step))
        xs = list(range(0, max(w - 2 * halo, 1), step))

        jobs = []  # (y0c, x0c, y1, x1) with uniform [tile, tile] extraction
        for y0 in ys:
            for x0 in xs:
                y1, x1 = min(y0 + tile, h), min(x0 + tile, w)
                jobs.append((max(0, y1 - tile), max(0, x1 - tile), y1, x1))

        def paste(job, sr):
            y0c, x0c, y1, x1 = job
            ty0 = 0 if y0c == 0 else halo
            tx0 = 0 if x0c == 0 else halo
            ty1 = (y1 - y0c) if y1 == h else (y1 - y0c) - halo
            tx1 = (x1 - x0c) if x1 == w else (x1 - x0c) - halo
            out[(y0c + ty0) * s:(y0c + ty1) * s, (x0c + tx0) * s:(x0c + tx1) * s, :] = \
                sr[ty0 * s:ty1 * s, tx0 * s:tx1 * s, :]

        for i in range(0, len(jobs), tile_batch):
            chunk = jobs[i:i + tile_batch]
            stack = np.stack([img_rgb[y0c:y0c + tile, x0c:x0c + tile, :]
                              for (y0c, x0c, _, _) in chunk])
            if len(chunk) < tile_batch:  # pad to the compiled batch shape
                pad = np.zeros((tile_batch - len(chunk),) + stack.shape[1:], stack.dtype)
                stack = np.concatenate([stack, pad])
            srs = self.upscale(stack)
            for job, sr in zip(chunk, srs):
                paste(job, sr)
        return out
