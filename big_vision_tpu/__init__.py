"""big_vision_tpu: a TPU-native vision/VLM training framework.

A ground-up JAX/XLA/Pallas/pjit re-design with the capabilities of
google-research/big_vision (reference layout documented in SURVEY.md).

Design pillars:
  * jit-only SPMD over `jax.sharding.Mesh` (no pmap anywhere).
  * tf.data-free data plane: host-async byte loading + jittable, batched
    preprocessing that runs on device.
  * Pallas kernels for the hot ops (attention, fused image ops).
  * String-registry config language compatible with the reference so its
    configs translate 1:1.
"""

__version__ = "0.1.0"
