from . import diffusion
from .cz_loader import infer_boundary_masks
from .diffusion import Sampler, gaussian_pulse_samplers, sine_samplers

__all__ = [
    "diffusion",
    "Sampler",
    "gaussian_pulse_samplers",
    "sine_samplers",
    "infer_boundary_masks",
]
