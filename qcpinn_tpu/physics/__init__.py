from .operators import (
    diffusion_operator,
    helmholtz_operator,
    klein_gordon_operator,
    navier_stokes_2d_operator,
    wave_operator,
)

__all__ = [
    "diffusion_operator",
    "helmholtz_operator",
    "klein_gordon_operator",
    "navier_stokes_2d_operator",
    "wave_operator",
]
