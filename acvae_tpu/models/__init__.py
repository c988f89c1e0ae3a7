from acvae_tpu.models import attention, rnn, encoders, latent, decoders, vae
from acvae_tpu.models.vae import VAECaptionModel, SimpleVAECaptionModel
