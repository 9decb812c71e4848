"""NeuS2-TPU: a TPU-native neural implicit surface reconstruction framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of NeuS2
(fast neural SDF reconstruction from multi-view images, static and dynamic
scenes), designed for TPU: fixed-shape masked ray marching under jit, autodiff
(incl. second-order for the eikonal loss) instead of hand-derived CUDA
gradients, and `shard_map` data parallelism over device meshes.
"""

__version__ = "0.1.0"

from neus2_tpu import constants  # noqa: F401
