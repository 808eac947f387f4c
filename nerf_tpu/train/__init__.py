from nerf_tpu.train.loss import create_loss  # noqa: F401
from nerf_tpu.train.optimizer import create_optimizer  # noqa: F401
from nerf_tpu.train.trainer import Trainer, render_train, train_step  # noqa: F401
