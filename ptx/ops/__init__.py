"""Pallas TPU kernels for the hot compute path."""
