from . import losses, optim
from .loop import TermSpec, diffusion_terms, make_train_step, make_val_fn, train

__all__ = [
    "losses",
    "optim",
    "TermSpec",
    "diffusion_terms",
    "make_train_step",
    "make_val_fn",
    "train",
]
