"""nrhints-tpu: TPU-native relightable neural SDF framework.

A from-scratch JAX/XLA/Pallas implementation of the NRHints method
("Relighting Neural Radiance Fields with Shadow and Highlight Hints",
SIGGRAPH 2023): a NeuS-style neural SDF plus a reflectance MLP conditioned on
view direction, point-light position, and two online-computed hints (shadow
transmittance of a secondary ray march toward the light, and Cook-Torrance
specular lobes), trained from photos lit by a moving point light.

Everything on the device hot path is pure-functional JAX compiled by XLA for
TPU, with optional Pallas kernels for the fused field evaluation; parallelism
is expressed as shardings over a `jax.sharding.Mesh` (rays data-parallel),
not as processes+NCCL like the PyTorch reference.
"""

__version__ = "0.1.0"
