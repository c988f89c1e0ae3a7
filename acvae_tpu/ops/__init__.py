from acvae_tpu.ops.masked import (
    length_mask,
    mean_with_lens,
    max_with_lens,
    masked_softmax,
)
from acvae_tpu.ops.losses import (
    cross_entropy,
    label_smoothing_loss,
    normal_kl_loss,
    gmm_kl_loss,
    scst_loss,
)
