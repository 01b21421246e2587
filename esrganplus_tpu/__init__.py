"""esrganplus_tpu — a TPU-native (JAX/XLA/Pallas) super-resolution framework.

From-scratch rebuild of the capabilities of ncarraz/ESRGANplus (ESRGAN+ / nESRGAN+ /
Tarsier): RRDB generators, RaGAN training, MATLAB-faithful evaluation — designed for
TPU (NHWC layout, scanned block stacks, pjit data parallelism) rather than ported
from the reference's PyTorch.
"""

__version__ = "0.1.0"
