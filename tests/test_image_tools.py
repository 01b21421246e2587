"""Offline image_tools CLI (reference ``codes/scripts`` long tail)."""

import os

import numpy as np

from esrganplus_tpu.cli.image_tools import main


def _write_frames(d, n=3, h=64, w=48):
    import cv2

    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(11)
    for i in range(n):
        cv2.imwrite(os.path.join(d, f"x{i}.png"),
                    (rng.rand(h, w, 3) * 255).astype(np.uint8))


def test_annotate_burns_text_and_crops(tmp_path):
    import cv2

    src, out = str(tmp_path / "in"), str(tmp_path / "out")
    _write_frames(src)
    main(["annotate", src, out, "--text", "a", "b", "c",
          "--pos", "5", "20", "--font-size", "0.5", "--thickness", "1"])
    for i, txt in enumerate("abc"):
        res = cv2.imread(os.path.join(out, f"x{i}_text.png"))
        orig = cv2.imread(os.path.join(src, f"x{i}.png"))
        assert res.shape == orig.shape  # crop inactive at offset 0 (ref semantics)
        assert (res != orig).any() and (res == orig).mean() > 0.5  # text burned locally

    # crop + enlarge path (both offsets nonzero -> crop active)
    out2 = str(tmp_path / "out2")
    main(["annotate", src, out2, "--crop-x", "8", "--crop-y", "8",
          "--crop-w", "16", "--crop-h", "24", "--enlarge", "2"])
    res = cv2.imread(os.path.join(out2, "x0_text.png"))
    assert res.shape == (48, 32, 3)


def test_gif_roundtrip(tmp_path):
    import imageio

    src = str(tmp_path / "in")
    _write_frames(src)
    gif = str(tmp_path / "out.gif")
    main(["gif", src, gif, "--duration", "0.1"])
    frames = imageio.mimread(gif)
    assert len(frames) == 3
    assert frames[0].shape[:2] == (64, 48)
