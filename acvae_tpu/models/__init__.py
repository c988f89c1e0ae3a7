from acvae_tpu.models import (attention, rnn, encoders, latent, decoders, vae,
                              captioner, trans_vae)
from acvae_tpu.models.vae import VAECaptionModel, SimpleVAECaptionModel
from acvae_tpu.models.captioner import AttnCaptionModel, TransformerCaptionModel
from acvae_tpu.models.trans_vae import TransVAECaptionModel
from acvae_tpu.models.build import build_model
