from .vqa_losses import (
    plain_bce,
    learned_mixin,
    learned_mixin_init,
    bias_product,
    reweight_by_inv_bias,
    lpf_loss,
    rubi_loss,
    cosine_rep_loss,
    dispatch_loss,
    convert_sigmoid_logits_to_binary_logprobs,
    elementwise_logsumexp,
    renormalize_binary_logits,
    bce_with_logits,
    LOSS_NAMES,
)

__all__ = [
    "plain_bce", "learned_mixin", "learned_mixin_init", "bias_product",
    "reweight_by_inv_bias", "lpf_loss", "rubi_loss", "cosine_rep_loss",
    "dispatch_loss", "convert_sigmoid_logits_to_binary_logprobs",
    "elementwise_logsumexp", "renormalize_binary_logits", "bce_with_logits",
    "LOSS_NAMES",
]
