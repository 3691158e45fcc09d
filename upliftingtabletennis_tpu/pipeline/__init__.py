from upliftingtabletennis_tpu.pipeline.interface import (
    BallDetector,
    TableDetector,
    TableTennisPipeline,
    UpliftingModel,
)
