from fourierdiffusion_tpu.training.callbacks import SamplingCallback
from fourierdiffusion_tpu.training.optim import cosine_warmup_schedule, make_optimizer
from fourierdiffusion_tpu.training.trainer import Trainer, TrainStateBundle

__all__ = [
    "SamplingCallback",
    "Trainer",
    "TrainStateBundle",
    "cosine_warmup_schedule",
    "make_optimizer",
]
