"""livingscenes_tpu — a TPU-native multi-object relocalization & reconstruction
framework (the capabilities of GradientSpaces/LivingScenes, re-designed for
JAX/XLA/Pallas on TPU).

Subpackages:
  se3       — batched SE(3)/SIM(3) math, Kabsch, Lie maps.
  ops       — point-cloud ops: kNN, FPS, ICP, Sinkhorn OT.
  nn        — SIM(3)-equivariant Vector-Neuron layer library + encoders/decoders.
  models    — shape prior (encode / SDF field) and the training model.
  solver    — matching, registration, latent optimization, scene orchestration.
  recon     — SDF grid evaluation + mesh extraction (native host backend).
  parallel  — device-mesh sharding helpers (pjit/shard_map over ICI).
  train     — config system, data pipeline, iteration trainer, checkpoints.
  eval      — metric suite and benchmark drivers.
"""

__version__ = "0.1.0"
