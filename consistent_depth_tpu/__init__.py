"""consistent_depth_tpu — a TPU-native framework for consistent video depth.

Re-implementation (not a port) of the capabilities of
facebookresearch/consistent_depth ("Consistent Video Depth Estimation",
Luo et al., SIGGRAPH 2020) designed for TPU hardware:

- compute path: JAX / XLA / Pallas, NHWC layouts, jit-compiled train step
- scaling: ``jax.sharding.Mesh`` data parallelism with psum gradient
  all-reduce over ICI (see :mod:`consistent_depth_tpu.parallel`)
- data: the whole per-video fine-tuning dataset is resident in HBM; an
  epoch is a sequence of device-side gathers, no host dataloader in the
  hot loop (see :mod:`consistent_depth_tpu.data`)
- runtime: native C++ IO codecs with ctypes bindings
  (see ``native/``), pure-Python fallbacks everywhere

Reference pipeline being matched: /root/reference (main.py, process.py).
"""

__version__ = "0.1.0"
