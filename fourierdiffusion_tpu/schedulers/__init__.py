from fourierdiffusion_tpu.schedulers.sde import (
    SDE,
    SamplingOutput,
    VEScheduler,
    VPScheduler,
    g_vector,
)

__all__ = ["SDE", "SamplingOutput", "VEScheduler", "VPScheduler", "g_vector"]
