from psg_tpu.diffusion.schedule import DiffusionSchedule, make_schedule
from psg_tpu.diffusion.sampling import (
    ddim_sample,
    ddpm_sample,
    ddpm_sample_fast,
    ddpm_sample_renoise,
    dpmpp_2m_sample,
    ddpm_sample_x0,
)

__all__ = [
    "DiffusionSchedule",
    "make_schedule",
    "ddim_sample",
    "ddpm_sample",
    "ddpm_sample_fast",
    "ddpm_sample_renoise",
    "dpmpp_2m_sample",
    "ddpm_sample_x0",
]
