"""End-to-end smoke of the evaluation CLI on a synthetic TUM-format sequence.

Exercises the full protocol glue — stream construction (undistort + resize +
crop via the native pipeline), tracking, terminate/trajectory-fill, TUM
ground-truth association and the ATE scorer — the path the reference only
tests by running real datasets (SURVEY §4). Random weights make the ATE value
meaningless; the contract is that the pipeline runs and reports finite
numbers for a well-formed sequence.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.mark.slow
def test_evaluate_tum_smoke(tmp_path):
    rng = np.random.default_rng(3)
    rgbdir = tmp_path / "rgb"
    rgbdir.mkdir()
    small = rng.integers(0, 255, (60, 80, 3), np.uint8)
    base = cv2.resize(small, (640, 480))
    gt_lines = []
    n = 12
    for i in range(n):
        M = np.float32([[1, 0, 4 * i], [0, 1, 2 * i]])
        img = cv2.warpAffine(base, M, (640, 480))
        ts = 1305031100.0 + 0.1 * i
        cv2.imwrite(str(rgbdir / f"{ts:.6f}.png"), img)
        gt_lines.append(f"{ts:.6f} {0.01 * i:.4f} 0 0 0 0 0 1")
    (tmp_path / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")

    env = dict(os.environ)
    res = subprocess.run(
        [
            sys.executable, "-m", "droid_slam_tpu.apps.evaluate",
            "--dataset", "tum", "--datapath", str(tmp_path),
            "--save_traj", str(tmp_path / "est.txt"),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    assert "ate_rmse" in res.stdout or "rmse" in res.stdout, res.stdout[-500:]
    est = np.loadtxt(tmp_path / "est.txt")
    assert est.shape[0] == (n + 1) // 2  # stride-2 protocol
    assert np.all(np.isfinite(est))


if __name__ == "__main__":
    pytest.main(["-x", __file__, "-q"])
