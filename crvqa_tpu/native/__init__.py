from .feature_store import FeatureStore, build_feature_store, ensure_built

__all__ = ["FeatureStore", "build_feature_store", "ensure_built"]
