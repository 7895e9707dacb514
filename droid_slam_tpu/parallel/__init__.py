"""Multi-device parallelism: edge-sharded global bundle adjustment with a
distributed Schur reduction, and data-parallel training helpers."""

from .sharded_ba import ShardedBAPlan, sharded_ba_iteration

__all__ = ["ShardedBAPlan", "sharded_ba_iteration"]
