"""Training logger: running-average metrics + optional TensorBoard.

TPU-native equivalent of /root/reference/droid_slam/logger.py (SUM_FREQ=100
running means printed as a status line and pushed to SummaryWriter).
TensorBoard is optional — falls back to stdout-only when absent."""

from __future__ import annotations

from typing import Dict

SUM_FREQ = 100


class Logger:
    def __init__(self, name: str, total_steps: int = 0, logdir: str = "runs"):
        self.name = name
        self.total_steps = total_steps
        self.running: Dict[str, float] = {}
        self._pushes = 0  # pushes since the last flush (a resumed step
        # counter starts mid-window, so dividing by SUM_FREQ would be wrong)
        self.writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(f"{logdir}/{name}")
        except Exception:
            pass

    def _print_status(self):
        keys = sorted(self.running.keys())
        n = max(self._pushes, 1)
        vals = [self.running[k] / n for k in keys]
        line = f"[{self.name} {self.total_steps:>6d}] " + " ".join(
            f"{k}={v:.4f}" for k, v in zip(keys, vals)
        )
        print(line, flush=True)

    def push(self, metrics: Dict[str, float]):
        self.total_steps += 1
        self._pushes += 1
        for k, v in metrics.items():
            self.running[k] = self.running.get(k, 0.0) + float(v)

        if self.total_steps % SUM_FREQ == 0:
            if self.writer is not None:
                for k in self.running:
                    self.writer.add_scalar(
                        k, self.running[k] / max(self._pushes, 1),
                        self.total_steps,
                    )
            self._print_status()
            self.running = {}
            self._pushes = 0

    def write_dict(self, d: Dict[str, float]):
        if self.writer is not None:
            for k, v in d.items():
                self.writer.add_scalar(k, v, self.total_steps)
