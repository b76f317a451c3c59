from . import loss  # noqa: F401
from .checkpoint import ckpt_path, load_checkpoint, save_checkpoint  # noqa: F401
from .evaluator import Evaluator, eval_bad_x  # noqa: F401
from .trainer import Trainer, TrainState, epoch_lr, make_optimizer  # noqa: F401
