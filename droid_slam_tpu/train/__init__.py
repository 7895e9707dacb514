"""Training: losses, train step, checkpointing, data-parallel mesh."""

from .losses import geodesic_loss, residual_loss, flow_loss

__all__ = ["geodesic_loss", "residual_loss", "flow_loss"]
