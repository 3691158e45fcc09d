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

__version__ = "0.2.0"


def _enable_compilation_cache():
    """Enable JAX's persistent compilation cache by default.

    Detector programs take 20-40s each to compile on TPU; caching makes every
    process after the first start in seconds. Opt out by setting
    UTT_NO_COMPILE_CACHE=1 or pre-setting JAX_COMPILATION_CACHE_DIR.
    """
    import os

    if os.environ.get("UTT_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            path = os.path.join(
                os.path.expanduser("~"), ".cache", "upliftingtabletennis_tpu", "jax_cache"
            )
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # never block import on cache setup
        pass


_enable_compilation_cache()
