from acvae_tpu.core.registry import Registry, ENCODERS, DECODERS, MODELS, LATENTS, LOSSES, SCHEDULES
from acvae_tpu.core.config import Config, load_config, dump_config
