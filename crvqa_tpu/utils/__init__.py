from .param_parser import dict_parser
from .metric_logger import MetricLogger, SmoothedValue

__all__ = ["dict_parser", "MetricLogger", "SmoothedValue"]
