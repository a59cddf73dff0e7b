"""Inference & evaluation: PER/d_score metrics, the eval harness with test
dumps, vocoder training/inference, and Griffin-Lim synthesis CLI."""

from .metrics import compute_per, compute_d_score, edit_distance

__all__ = ["compute_per", "compute_d_score", "edit_distance"]
