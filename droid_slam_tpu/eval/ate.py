"""Trajectory evaluation: Umeyama alignment + absolute trajectory error.

Self-contained replacement for the `evo` dependency the reference's
evaluation scripts shell out to (/root/reference/evaluation_scripts/
test_tum.py:98-122, test_euroc.py:118-140, test_eth3d.py:109-133):
APE on translation after SE(3)/Sim(3) Umeyama alignment, with optional
scale correction (monocular protocols align+scale; ETH3D RGB-D aligns
without scale, test_eth3d.py:130-131).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class Trajectory:
    """Timestamped positions+quaternions, TUM convention (t, xyz, q_xyzw)."""

    tstamps: np.ndarray  # [T]
    positions: np.ndarray  # [T, 3]
    quats: np.ndarray  # [T, 4] xyzw

    @staticmethod
    def from_poses(tstamps, poses_c2w: np.ndarray) -> "Trajectory":
        """poses_c2w: [T, 7] camera-to-world (t, q_xyzw)."""
        return Trajectory(
            np.asarray(tstamps, np.float64),
            np.asarray(poses_c2w[:, :3], np.float64),
            np.asarray(poses_c2w[:, 3:7], np.float64),
        )

    @staticmethod
    def load_tum(path: str) -> "Trajectory":
        data = np.loadtxt(path, comments="#", dtype=np.float64)
        return Trajectory(data[:, 0], data[:, 1:4], data[:, 4:8])

    @staticmethod
    def load_tartanair(path: str) -> "Trajectory":
        """TartanAir pose_left.txt: 7 columns (NED txyz + quat), NO
        timestamp column. Permute ned->xyz and stamp with the row index,
        exactly like the reference (validate_tartanair.py:93-94)."""
        raw = np.loadtxt(path, delimiter=" ", dtype=np.float64)
        raw = raw[:, [1, 2, 0, 4, 5, 3, 6]]
        return Trajectory(
            np.arange(len(raw), dtype=np.float64), raw[:, :3], raw[:, 3:]
        )

    def save_tum(self, path: str):
        data = np.concatenate(
            [self.tstamps[:, None], self.positions, self.quats], axis=1
        )
        np.savetxt(path, data, fmt="%.9f")

    @staticmethod
    def load_euroc_csv(path: str) -> "Trajectory":
        """Load ground truth straight from a EuRoC sequence's own
        ``mav0/state_groundtruth_estimate0/data.csv`` (columns: timestamp[ns],
        p_xyz, q_wxyz, ...). The reference instead ships pre-converted copies
        in-repo (/root/reference/data/euroc_groundtruth/*.txt, consumed at
        /root/reference/evaluation_scripts/test_euroc.py:134); reading the
        dataset's native CSV removes that shipped-data dependency.
        Timestamps are converted ns → seconds; quaternions wxyz → xyzw."""
        data = np.loadtxt(path, comments="#", delimiter=",", dtype=np.float64)
        tstamps = data[:, 0] / 1e9
        positions = data[:, 1:4]
        quats = data[:, [5, 6, 7, 4]]  # wxyz -> xyzw
        return Trajectory(tstamps, positions, quats)

    @staticmethod
    def load(path: str) -> "Trajectory":
        """Dispatch on extension: .csv = EuRoC native, else TUM text."""
        if path.endswith(".csv"):
            return Trajectory.load_euroc_csv(path)
        return Trajectory.load_tum(path)


def associate(
    t_a: np.ndarray, t_b: np.ndarray, max_dt: float = 0.02
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy timestamp association in globally ASCENDING dt order (the TUM
    benchmark convention). Iterating t_a first-come instead would let a
    dense-GT sample up to max_dt early claim an estimate frame before its
    dt~0 partner is considered, biasing every matched pair stale."""
    order_b = np.argsort(t_b)
    tb_sorted = t_b[order_b]
    # candidates: each ta's two bracketing tb neighbors
    pos = np.searchsorted(tb_sorted, t_a)
    cand = []
    for k, ta in enumerate(t_a):
        for c in (pos[k] - 1, pos[k]):
            if 0 <= c < len(tb_sorted):
                dt = abs(tb_sorted[c] - ta)
                if dt <= max_dt:
                    cand.append((dt, k, order_b[c]))
    cand.sort(key=lambda x: x[0])
    used_a = np.zeros(len(t_a), bool)
    used_b = np.zeros(len(t_b), bool)
    ia, ib = [], []
    for _, k, j in cand:
        if not used_a[k] and not used_b[j]:
            used_a[k] = True
            used_b[j] = True
            ia.append(k)
            ib.append(j)
    order = np.argsort(ia)
    return (
        np.asarray(ia, np.int64)[order],
        np.asarray(ib, np.int64)[order],
    )


def align_umeyama(
    model: np.ndarray, data: np.ndarray, correct_scale: bool = False
) -> Tuple[float, np.ndarray, np.ndarray]:
    """Least-squares similarity transform aligning `model` onto `data`
    (Umeyama 1991). Both [N, 3]. Returns (s, R, t) with
    data ≈ s · R @ model + t."""
    mu_m = model.mean(axis=0)
    mu_d = data.mean(axis=0)
    mc = model - mu_m
    dc = data - mu_d

    cov = dc.T @ mc / len(model)
    U, S, Vt = np.linalg.svd(cov)
    W = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        W[2, 2] = -1
    R = U @ W @ Vt
    if correct_scale:
        var_m = (mc**2).sum() / len(model)
        s = float(np.trace(np.diag(S) @ W) / var_m)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_m
    return s, R, t


def ate_rmse(
    gt: Trajectory,
    est: Trajectory,
    correct_scale: bool = False,
    max_dt: float = 0.02,
) -> dict:
    """Absolute trajectory error after alignment — the metric all four
    reference eval protocols report (SURVEY §6)."""
    ia, ib = associate(gt.tstamps, est.tstamps, max_dt=max_dt)
    if len(ia) < 3:
        raise ValueError(f"only {len(ia)} associated poses")
    P = est.positions[ib]
    G = gt.positions[ia]
    s, R, t = align_umeyama(P, G, correct_scale=correct_scale)
    P_aligned = s * P @ R.T + t
    err = np.linalg.norm(P_aligned - G, axis=1)
    return {
        "ate_rmse": float(np.sqrt(np.mean(err**2))),
        "ate_mean": float(err.mean()),
        "ate_median": float(np.median(err)),
        "ate_max": float(err.max()),
        "n_pairs": int(len(ia)),
        "scale": s,
    }
