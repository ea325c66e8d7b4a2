from diffusion_tpu.schedulers.ddpm import DDPMScheduler
from diffusion_tpu.schedulers.ddim import DDIMScheduler
from diffusion_tpu.schedulers.continuous import ContinuousTimeScheduler, tangent_schedule
from diffusion_tpu.schedulers.dpm import (DPMSolverMultistepScheduler,
                                          EulerDiscreteScheduler)

__all__ = ["DDPMScheduler", "DDIMScheduler", "ContinuousTimeScheduler",
           "tangent_schedule", "DPMSolverMultistepScheduler",
           "EulerDiscreteScheduler"]
