from wavedm_tpu.diffusion.schedules import get_beta_schedule, compute_alpha, ddim_timesteps
from wavedm_tpu.diffusion.loss import noise_estimation_loss, antithetic_timesteps
from wavedm_tpu.diffusion.ema import ema_init, ema_update
