from .detect import Detector, resize_img
from .widerface import wider_evaluation, eval_map

__all__ = ["Detector", "resize_img", "wider_evaluation", "eval_map"]
