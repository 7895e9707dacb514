"""Pure-JAX / Pallas compute kernels: Lie groups, projective geometry,
correlation, dense bundle adjustment."""

from . import lie  # noqa: F401
from . import projective  # noqa: F401
from . import ba  # noqa: F401
from . import corr  # noqa: F401
