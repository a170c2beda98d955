"""neuroclear_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for single-stack
axial super-resolution of 3D fluorescence-microscopy volumes.

Re-designed from scratch with the capabilities of the NeuroClear reference
(Park et al., Nature Communications 2022): a 3D-generator / 2D-discriminator
CycleGAN that makes every viewing axis of a volume look like its sharp lateral
(XY) plane, trained self-supervised from a single stack.

Design principles (TPU-first):
  * All compute-path code is pure-functional JAX, compiled once per shape.
  * Networks are param-pytrees with explicit ``init``/``apply``; NDHWC layouts.
  * The whole CycleGAN iteration (G fwd, 12 random slice/MIP discriminator
    probes, both grad steps) is one fused jitted program.
  * The augmentation chain (random XY rotation + inscribed-rect crop + random
    crop + flips + normalize) runs on device as a single gather-based kernel.
  * Tiled ("dice") inference streams cube batches through a pjit-able forward
    with on-device overlap blending.
  * Scale-out is a ``jax.sharding.Mesh`` with a ``data`` axis (the reference's
    only parallelism was single-process DataParallel).
"""

__version__ = "0.1.0"
