from .torch_import import load_pth_params
from .logging import get_logger, MetricsLogger

__all__ = ["load_pth_params", "get_logger", "MetricsLogger"]
