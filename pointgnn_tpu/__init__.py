"""Point-GNN/TPU: a TPU-native (JAX/XLA/Pallas) 3D point-cloud object
detection framework with the capabilities of Point-GNN (CVPR 2020).

The framework re-implements the full capability surface of the reference
implementation (graph construction over LiDAR point clouds, graph neural
network with auto-registration, class-aware box regression, box merging
NMS, KITTI dataset tooling, training/eval/inference drivers) as an
idiomatic TPU stack:

- static-shape padded graphs compiled once under ``jax.jit``
- MXU-friendly edge MLPs + masked segment aggregations
- data parallelism via ``jax.sharding`` meshes and ``psum`` collectives
- host-side numpy kernels for file IO and augmentation only
"""

__version__ = "0.1.0"
