from upliftingtabletennis_tpu.train.uplifting_train import (
    TrainState,
    create_train_state,
    make_train_step,
)
