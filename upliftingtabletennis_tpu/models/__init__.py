from upliftingtabletennis_tpu.models.uplifting import (
    MultiStageModel,
    SingleStageModel,
    get_uplifting_model,
)
