from esrganplus_tpu.ops.resize import imresize, imresize_np, resize_matrix
from esrganplus_tpu.ops.color import bgr2ycbcr, rgb2ycbcr, ycbcr2rgb, channel_convert, modcrop, y_channel_jax
from esrganplus_tpu.ops.metrics import calculate_psnr, calculate_ssim, psnr_jax, ssim_jax
from esrganplus_tpu.ops.image_io import read_img, save_img, img2tensor, tensor2img, scan_images

__all__ = [
    "imresize",
    "imresize_np",
    "resize_matrix",
    "bgr2ycbcr",
    "rgb2ycbcr",
    "ycbcr2rgb",
    "channel_convert",
    "modcrop",
    "y_channel_jax",
    "calculate_psnr",
    "calculate_ssim",
    "psnr_jax",
    "ssim_jax",
    "read_img",
    "save_img",
    "img2tensor",
    "tensor2img",
    "scan_images",
]
