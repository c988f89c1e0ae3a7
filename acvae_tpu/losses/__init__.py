from acvae_tpu.losses.wrappers import (
    masked_cross_entropy,
    masked_label_smoothing,
    augment_loss,
    bce_logits_loss,
    reparameterize_argmax,
    gumbel_softmax,
    condition_loss,
    specificity_loss,
    adverse_loss,
)
