"""qcpinn_tpu — a TPU-native framework for hybrid quantum-classical
physics-informed neural networks (QCPINN / HQPINN), built from scratch in
JAX/XLA/Pallas with the capabilities of the PyTorch/PennyLane/Qiskit
reference (masapasa/qcpinn-convection-diffusion-qiskit)."""

__version__ = "0.1.0"
