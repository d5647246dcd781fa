from .bert import MPlugBertConfig, TextDecoder, TextEncoder, FusionEncoder
from .generator import beam_generate, greedy_generate
from .mplug import MPlug, MPlugConfig, momentum_update
from .vit import ViTConfig, VisionTransformer, interpolate_pos_embed

__all__ = [
    "MPlugBertConfig", "TextDecoder", "TextEncoder", "FusionEncoder",
    "beam_generate", "greedy_generate",
    "MPlug", "MPlugConfig", "momentum_update",
    "ViTConfig", "VisionTransformer", "interpolate_pos_embed",
]
