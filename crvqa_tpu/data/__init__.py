from .synthetic import synthetic_batch, synthetic_batches

__all__ = ["synthetic_batch", "synthetic_batches"]
