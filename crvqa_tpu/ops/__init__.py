from .kthvalue import kth_smallest, sparsity_threshold

__all__ = ["kth_smallest", "sparsity_threshold"]
