"""UpliftingTableTennis-TPU: a TPU-native JAX framework for monocular
table-tennis video -> 3D trajectory + spin estimation.

Re-implements the capabilities of the reference PyTorch/CUDA codebase
(KieDani/UpliftingTableTennis, WACV 2026) as an idiomatic JAX/XLA/Pallas
framework: jitted geometry & calibration, a vmapped differentiable physics
engine replacing MuJoCo datagen, flax transformer/CNN detection models, and
pjit/shard_map data-parallel training over TPU meshes.

Layering (bottom-up):
    core/       geometry, calibration, physics  (pure-JAX, jittable)
    ops/        attention / peak-extraction / NMS kernels (XLA + Pallas)
    models/     flax.linen model families (uplifting transformer, ViT,
                HRNet/WASB, SegFormer-class detector)
    data/       dataset readers + jittable stateless-PRNG augmentations
    parallel/   mesh construction and sharding strategies
    train/      optax training loops with EMA + multi-criteria checkpointing
    pipeline/   user-facing BallDetector/TableDetector/UpliftingModel/
                TableTennisPipeline API (mirrors reference interface.py)
    eval/       metric/protocol parity with reference inference/ scripts
"""

__version__ = "0.1.0"
