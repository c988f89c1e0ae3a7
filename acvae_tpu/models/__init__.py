from acvae_tpu.models import attention, rnn
