from . import ansatz, gates, measure, program, statevector
from .circuit import DVCircuit
from .measure import NoiseModel

__all__ = [
    "ansatz",
    "gates",
    "measure",
    "program",
    "statevector",
    "DVCircuit",
    "NoiseModel",
]
