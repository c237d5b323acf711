"""Gaussian diffusion over latent flow volumes."""

from cvpr23_lfdm_tpu.diffusion.schedule import DiffusionSchedule, cosine_beta_schedule
from cvpr23_lfdm_tpu.diffusion.gaussian_diffusion import GaussianDiffusion
