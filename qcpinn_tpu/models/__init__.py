from . import nn_core
from .classical_solver import ClassicalSolver, hopfield_apply, hopfield_init
from .dv_solver import DVSolver

__all__ = [
    "nn_core",
    "ClassicalSolver",
    "DVSolver",
    "hopfield_apply",
    "hopfield_init",
]
