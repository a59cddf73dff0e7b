"""Pallas TPU kernels for the hot compute paths.

The reference has no custom kernels (pure torch ops); these are TPU-native
performance additions. Each kernel has a jnp reference implementation and
parity tests (interpret mode on CPU, compiled on TPU)."""

from .attention import flash_attention

__all__ = ["flash_attention"]
