"""super_resolution_tpu: a TPU-native (JAX/XLA/Pallas) super-resolution framework.

A from-scratch rebuild of the capabilities of imjaegyun/super_resolution
(HAT + ESC + BasicSR stack) designed TPU-first:

- Models are pure-functional flax.linen modules in NHWC layout.
- The compute path is jit-compiled XLA with Pallas kernels for the hot ops
  (fused window attention with relative position bias).
- Tile-based large-image inference runs fully on device (batched tiles,
  zero host round-trips) and shards tiles over a `jax.sharding.Mesh`.
- Training uses optax + orbax with a functional TrainState instead of the
  reference's BaseModel OOP hierarchy (ref: HAT/ESC/basicsr/models/base_model.py).
"""

__version__ = "0.1.0"
