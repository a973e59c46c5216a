"""Training layer: jitted steps, trainers, history artifacts.

Reference components covered (SURVEY.md §2.3): T1 UNetTrainer semantics
(trainer.py), T2 combined loss wiring, T3 GAN training (gan.py), T4
progressive training, T5 diffusion train/val (diffusion.py), T7
checkpoint/resume utilities (mrisr_tpu.ckpt).
"""

from mrisr_tpu.train.state import TrainState, make_optimizer  # noqa: F401
from mrisr_tpu.train.trainer import SupervisedTrainer  # noqa: F401
from mrisr_tpu.train.gan import GANTrainer  # noqa: F401
from mrisr_tpu.train.diffusion import DiffusionTrainer  # noqa: F401
from mrisr_tpu.train.history import TrainingHistory  # noqa: F401
