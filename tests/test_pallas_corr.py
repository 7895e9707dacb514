"""Pallas fused-corr kernel vs the XLA one-hot sampler oracle.

Runs in Pallas interpret mode (TPU-semantics emulation — the MXU's bfloat16
mantissa shows up as ~2e-3 relative on the volume values, hence the
tolerance). The Mosaic hardware compile of this kernel currently crashes the
axon remote-compile helper (two chained masked-selection stages; each stage
in isolation compiles fine — see ops/pallas_corr.py); until that toolchain
bug clears, the XLA formulation (ops/corr.py corr_lookup_fused) stays the
production path and this suite pins the kernel's semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from droid_slam_tpu.ops import corr as corr_ops
from droid_slam_tpu.ops import pallas_corr as pc

rng = np.random.default_rng(5432)


def _case(N=1, h=6, w=8, C=16):
    f1 = jnp.asarray(rng.standard_normal((N, h * w, C)).astype(np.float32) * 0.25)
    f2 = jnp.asarray(rng.standard_normal((N, h, w, C)).astype(np.float32) * 0.25)
    coords = jnp.asarray(
        (rng.random((N, h * w, 2)) * np.array([w + 6, h + 6]) - 3).astype(np.float32)
    )
    return f1, f2, coords


def _ref_level(f1, f2, coords, radius=3):
    with jax.default_matmul_precision("highest"):
        ref = jax.jit(
            lambda a, b, c: corr_ops._alt_corr_level_T(a, b, c, radius)
        )(f1, f2, coords)
    return jnp.swapaxes(ref, 1, 2)  # [N, rd², P]


def test_level_kernel_matches_xla_sampler():
    f1, f2, coords = _case()
    out = pc.corr_level_pallas(f1, f2, coords, interpret=True)
    ref = _ref_level(f1, f2, coords)
    # interpret mode emulates MXU bf16 passes → ~2e-3 relative on the volume
    assert float(jnp.abs(ref - out).max()) < 1e-2
    # ... but indexing must be exact: large error would mean a shifted window
    assert float(jnp.abs(ref - out).mean()) < 2e-3


def test_level_kernel_out_of_bounds_windows_zero():
    f1, f2, _ = _case()
    N, p = f1.shape[:2]
    coords = jnp.full((N, p, 2), 1000.0, jnp.float32)  # far outside the map
    out = pc.corr_level_pallas(f1, f2, coords, interpret=True)
    assert float(jnp.abs(out).max()) == 0.0


def test_full_lookup_matches_xla_fused():
    N, h, w, C = 1, 8, 8, 16
    f1 = jnp.asarray(rng.standard_normal((N, h, w, C)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((N, h, w, C)).astype(np.float32))
    coords = jnp.asarray(
        (rng.random((N, h, w, 2)) * np.array([w, h])).astype(np.float32)
    )
    got = pc.corr_lookup_pallas(f1, f2, coords, interpret=True)
    with jax.default_matmul_precision("highest"):
        want = jax.jit(corr_ops.corr_lookup_fused)(f1, f2, coords)
    assert got.shape == want.shape
    assert float(jnp.abs(got - want).max()) < 5e-2  # |corr| ~ O(4) here


def test_split_level_matches_fused_kernel():
    """Two-pallas_call formulation == fused kernel, elementwise exact
    (identical dot + identical selection semantics, only staged via HBM)."""
    f1, f2, coords = _case()
    fused = pc.corr_level_pallas(f1, f2, coords, interpret=True)
    split = pc.corr_level_pallas_split(f1, f2, coords, interpret=True)
    assert float(jnp.abs(fused - split).max()) == 0.0
    ref = _ref_level(f1, f2, coords)
    assert float(jnp.abs(ref - split).max()) < 1e-2


def test_split_out_of_bounds_windows_zero():
    f1, f2, _ = _case()
    N, p = f1.shape[:2]
    coords = jnp.full((N, p, 2), 1000.0, jnp.float32)
    out = pc.corr_level_pallas_split(f1, f2, coords, interpret=True)
    assert float(jnp.abs(out).max()) == 0.0


def test_split_full_lookup_matches_xla_fused():
    N, h, w, C = 1, 8, 8, 16
    f1 = jnp.asarray(rng.standard_normal((N, h, w, C)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((N, h, w, C)).astype(np.float32))
    coords = jnp.asarray(
        (rng.random((N, h, w, 2)) * np.array([w, h])).astype(np.float32)
    )
    got = pc.corr_lookup_pallas(f1, f2, coords, interpret=True, split=True)
    with jax.default_matmul_precision("highest"):
        want = jax.jit(corr_ops.corr_lookup_fused)(f1, f2, coords)
    assert got.shape == want.shape
    assert float(jnp.abs(got - want).max()) < 5e-2


if __name__ == "__main__":
    pytest.main(["-x", __file__, "-q"])
