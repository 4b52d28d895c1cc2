"""stein_tpu — a TPU-native Stein Variational Gradient Descent engine.

A from-scratch JAX/XLA/Pallas/pjit framework with the full capability surface
of the reference SVGD library (JamesBrofos/Stein), redesigned TPU-first: the
entire SVGD step is one jitted on-device program, the kernel matrix runs as
blocked Pallas tiles for large particle counts, and particles shard across a
device mesh with psum/all-gather collectives.
"""

from .version import __version__
from .api import (
    SVGDSampler,
    SVGDState,
    SteinSampler,
    throughput_config,
)
from .ops.optimizers import (
    Adam,
    Adagrad,
    AdamGradientDescent,
    AdagradGradientDescent,
)
from .kernels import SquaredExponentialKernel, InverseMultiquadricKernel
from .ops.pallas_step import InKernelModel

__all__ = [
    "__version__",
    "SVGDSampler",
    "SVGDState",
    "SteinSampler",
    "throughput_config",
    "InKernelModel",
    "Adam",
    "Adagrad",
    "AdamGradientDescent",
    "AdagradGradientDescent",
    "SquaredExponentialKernel",
    "InverseMultiquadricKernel",
]
