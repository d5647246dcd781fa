from .binarizers import (
    binarize_ste,
    binarize_sign,
    make_binarize_bernoulli,
    clamp_scores_sign,
    get_binarizer,
)
from .compaction import (
    apply_dense_ffn_mask,
    apply_dense_head_mask,
    compact_lang_ffns,
    compact_lang_heads,
    head_mask_from_scores,
)
from .masker import Masker, magnitude_masks, reference_rand_masks
from .spec import (
    MaskSpec,
    lxmert_mask_specs,
    visualbert_mask_specs,
    specs_by_modality,
    LXMERT_WEIGHT_TYPES,
    VISUALBERT_WEIGHT_TYPES,
)
from .sparsity_control import (
    MaskerScheduler,
    ModalSparsity,
    automated_gradual_sparsity,
    stepwise_sparsity,
)

__all__ = [
    "binarize_ste", "binarize_sign", "make_binarize_bernoulli",
    "clamp_scores_sign", "get_binarizer",
    "Masker", "magnitude_masks", "reference_rand_masks",
    "compact_lang_heads", "compact_lang_ffns", "head_mask_from_scores",
    "apply_dense_head_mask", "apply_dense_ffn_mask",
    "MaskSpec", "lxmert_mask_specs", "visualbert_mask_specs",
    "specs_by_modality", "LXMERT_WEIGHT_TYPES", "VISUALBERT_WEIGHT_TYPES",
    "MaskerScheduler", "ModalSparsity",
    "automated_gradual_sparsity", "stepwise_sparsity",
]
