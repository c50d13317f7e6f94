"""goliath_tpu — TPU-native codec-avatar framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
facebookresearch/goliath (Codec Avatar Studio): personalized relightable
codec avatars (Gaussian-splat heads, MVP volumetric hands, relightable
URHand, mesh-VAE bodies), trained from multi-view dome captures.

Design, not a port:
  * compute path is jax.numpy + Pallas TPU kernels under `jit`/`pjit`
  * renderers (Gaussian splatting, mesh rasterization, MVP raymarching)
    share a tile-binning engine built on XLA sort + segment offsets
    instead of CUDA per-thread BVH traversal / atomics
  * scale-out is a `jax.sharding.Mesh` over batch x camera with gradient
    allreduce over ICI (the reference is single-GPU per job)
"""

__version__ = "0.1.0"
