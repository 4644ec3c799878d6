"""workoutdetector_tpu — a TPU-native fitness-video understanding framework.

A from-scratch rebuild of the capabilities of iucario/WorkoutDetector
(action recognition, exercise-state recognition, online repetition
counting) designed TPU-first: JAX/XLA for the compute path, Pallas for
fused kernels, jax.sharding meshes for scale-out, and a C++ host video
decoder feeding fixed-shape device batches.

Layer map (mirrors reference SURVEY.md §1, re-architected):
  config      — single typed config system (replaces fvcore CfgNode + mmcv)
  data        — annotation layer, frame sampling, datasets, host video decode
  ops         — jit-fused preprocessing + Pallas kernels
  models      — flax TSM / TDN / image classifiers (NHWC, bf16-friendly)
  train       — sharded training loop, optimizer policies, checkpointing
  infer       — compiled inference engine, rep counting, dataset evaluation
  serve       — WebSocket/HTTP serving honoring the reference app contract
  parallel    — device mesh & sharding helpers (dp/tp axes reserved)
"""

__version__ = "0.1.0"
