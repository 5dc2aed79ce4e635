"""CSV / TensorBoard logging with the reference's exact column schemas.

- swin metrics.csv: [Epoch, Loss_G, Loss_D, PSNR, SSIM, Time_Sec]
  (train_swin.py:190-193,308-310)
- hat train_log.csv: [Epoch, G_Total, L1, G_Adv, D_Total, PSNR, SSIM, LR]
  (train_hat.py:104-108,300-312)
- TensorBoard scalar 'Metrics/PSNR' (train_swin.py:118,305)
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Sequence

SWIN_CSV_COLUMNS = ["Epoch", "Loss_G", "Loss_D", "PSNR", "SSIM", "Time_Sec"]
HAT_CSV_COLUMNS = ["Epoch", "G_Total", "L1", "G_Adv", "D_Total", "PSNR", "SSIM", "LR"]


class CSVLogger:
    def __init__(self, path: str | Path, columns: Sequence[str], resume: bool = False):
        self.path = Path(path)
        self.columns = list(columns)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        if not resume or not self.path.exists():
            with open(self.path, "w", newline="") as f:
                csv.writer(f).writerow(self.columns)

    def log(self, row: dict | Sequence) -> None:
        if isinstance(row, dict):
            row = [row.get(c, "") for c in self.columns]
        with open(self.path, "a", newline="") as f:
            csv.writer(f).writerow(row)


class TensorBoardLogger:
    """Thin TF-summary wrapper; degrades to no-op if TF is unavailable."""

    def __init__(self, log_dir: str | Path):
        self.writer = None
        try:
            import tensorflow as tf  # noqa: F401

            self.writer = tf.summary.create_file_writer(str(log_dir))
        except Exception:
            pass

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self.writer is None:
            return
        import tensorflow as tf

        with self.writer.as_default():
            tf.summary.scalar(tag, float(value), step=step)

    def flush(self) -> None:
        if self.writer is not None:
            self.writer.flush()
