from acvae_tpu.train.schedules import (
    exponential_decay_schedule, noam_schedule, warmup_linear_schedule,
    warmup_cosine_schedule, build_schedule,
)
from acvae_tpu.train.trainer import TrainState, make_train_step
