#!/usr/bin/env python
"""Convert EuRoC MAV native ground truth to TUM trajectory format.

The reference repo ships pre-converted ground-truth files
(/root/reference/data/euroc_groundtruth/*.txt, read by
/root/reference/evaluation_scripts/test_euroc.py:134). This tool derives the
same thing from the dataset's own ``mav0/state_groundtruth_estimate0/data.csv``
so no ground-truth data needs to live in this repo; apps/evaluate.py also
reads the CSV directly (eval/ate.py Trajectory.load_euroc_csv).

Usage:
  python tools/euroc_groundtruth.py datasets/EuRoC/MH_01_easy [out.txt]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from droid_slam_tpu.eval.ate import Trajectory  # noqa: E402


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    seq = sys.argv[1]
    csv = seq if seq.endswith(".csv") else os.path.join(
        seq, "mav0", "state_groundtruth_estimate0", "data.csv"
    )
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(csv), "groundtruth_tum.txt"
    )
    traj = Trajectory.load_euroc_csv(csv)
    traj.save_tum(out)
    print(f"{len(traj.tstamps)} poses -> {out}")


if __name__ == "__main__":
    main()
