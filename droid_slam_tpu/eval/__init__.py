"""Evaluation: trajectory alignment + ATE scoring, per-dataset protocols."""

from .ate import ate_rmse, align_umeyama, Trajectory

__all__ = ["ate_rmse", "align_umeyama", "Trajectory"]
