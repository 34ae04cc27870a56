"""pbrt_tpu — a TPU-native differentiable spectral path tracer (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of w3ntao/pbrt-minus
(reference: /root/reference) for TPU hardware:

  - SoA scenes compiled on host into flat jax pytrees (`pbrt_tpu.scene`)
  - spectral rendering with 4 wavelengths/path (`pbrt_tpu.spectral`)
  - branchless, masked, dense wavefront execution under `jit`
  - BVH built host-side, traversed with `lax.while_loop` / Pallas kernels
  - multi-chip scaling via `jax.sharding.Mesh` (`pbrt_tpu.parallel`)
  - end-to-end differentiable w.r.t. materials / lights / camera

Layer map (mirrors SURVEY.md §1, re-architected for XLA):
  utils, geometry      L1: math, transforms, RNG
  spectral             L2: sampled spectra, colorimetry, rgb->spectrum
  shapes/materials/... L3: scene object tables (type-code + SoA params)
  accel                L4: LBVH build (host) + traversal kernels
  integrators          L5: path/wavefront/AO/normal/BDPT/MLT
  scene                L6: .pbrt lexer/parser/builder -> SceneArrays
"""

__version__ = "0.1.0"
