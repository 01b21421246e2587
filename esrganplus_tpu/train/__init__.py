from esrganplus_tpu.train.schedule import multistep_lr
from esrganplus_tpu.train.sr_model import SRTrainConfig, SRTrainer, make_optimizer, pixel_loss

__all__ = ["multistep_lr", "SRTrainConfig", "SRTrainer", "make_optimizer", "pixel_loss"]
