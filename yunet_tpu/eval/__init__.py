from .detect import Detector, resize_img
from .widerface import wider_evaluation, eval_map
from .eval_hook import make_wider_eval_hook, widerface_eval_mode

__all__ = ["Detector", "resize_img", "wider_evaluation", "eval_map",
           "make_wider_eval_hook", "widerface_eval_mode"]
