from .classifier import SimpleClassifier, FCNet, GTH
from .layers import WeightNormDense, TransformerLayer, extend_attention_mask
from .lxmert import LxmertConfig, LxmertForVQA, LxmertModel

__all__ = [
    "SimpleClassifier", "FCNet", "GTH",
    "WeightNormDense", "TransformerLayer", "extend_attention_mask",
    "LxmertConfig", "LxmertForVQA", "LxmertModel",
]
