"""maskflownet_tpu: a TPU-native optical-flow framework (JAX/XLA/Pallas).

Brand-new implementation of the capabilities of microsoft/MaskFlownet
(CVPR 2020) designed for TPU: NHWC layouts, bf16 compute, one pjit-compiled
train step (augmentation + forward + multiscale loss + grad + Adam), Pallas
kernels for correlation/warp/deformable-conv, and data-parallel scaling over
``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
