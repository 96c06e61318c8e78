"""Training logger.

Role of stable_baselines3/common/logger.py:430-639: key/value records dumped
to any of stdout (aligned table), CSV, JSON-lines and TensorBoard.  The
TensorBoard writer uses torch.utils.tensorboard when available (torch-cpu is
in the image) and degrades to a no-op otherwise.
"""
from __future__ import annotations

import csv
import json
import os
import sys
import time
from typing import Any, Dict, List, Optional


class HumanOutput:
    def __init__(self, stream=None):
        self.stream = stream or sys.stdout

    def write(self, kvs: Dict[str, Any], step: int) -> None:
        key2str = {}
        for k in sorted(kvs):
            v = kvs[k]
            key2str[k] = f"{v:.3g}" if isinstance(v, float) else str(v)
        if not key2str:
            return
        kw = max(map(len, key2str.keys()))
        vw = max(map(len, key2str.values()))
        dashes = "-" * (kw + vw + 7)
        lines = [dashes]
        for k, v in key2str.items():
            lines.append(f"| {k}{' ' * (kw - len(k))} | {v}{' ' * (vw - len(v))} |")
        lines.append(dashes)
        self.stream.write("\n".join(lines) + "\n")
        self.stream.flush()

    def close(self):
        pass


class CSVOutput:
    def __init__(self, filename: str):
        self.filename = filename
        self.keys: List[str] = []
        self.file = open(filename, "w", newline="")
        self.writer = None

    def write(self, kvs: Dict[str, Any], step: int) -> None:
        extra = [k for k in sorted(kvs) if k not in self.keys]
        if extra or self.writer is None:
            self.keys.extend(extra)
            self.file.close()
            # rewrite with new header, preserving old rows
            rows = []
            if os.path.exists(self.filename):
                with open(self.filename) as f:
                    rows = list(csv.DictReader(f))
            self.file = open(self.filename, "w", newline="")
            self.writer = csv.DictWriter(self.file, fieldnames=self.keys)
            self.writer.writeheader()
            for r in rows:
                self.writer.writerow(r)
        self.writer.writerow({k: kvs.get(k, "") for k in self.keys})
        self.file.flush()

    def close(self):
        self.file.close()


class JSONOutput:
    def __init__(self, filename: str):
        self.file = open(filename, "w")

    def write(self, kvs: Dict[str, Any], step: int) -> None:
        self.file.write(json.dumps({k: float(v) if hasattr(v, "item") else v
                                    for k, v in kvs.items()}) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


class TensorBoardOutput:
    def __init__(self, log_dir: str):
        from torch.utils.tensorboard import SummaryWriter  # torch-cpu in image

        self.writer = SummaryWriter(log_dir=log_dir)

    def write(self, kvs: Dict[str, Any], step: int) -> None:
        for k, v in kvs.items():
            if isinstance(v, (int, float)):
                self.writer.add_scalar(k, v, step)
        self.writer.flush()

    def close(self):
        self.writer.close()


class Logger:
    def __init__(self, outputs):
        self.outputs = outputs
        self.name_to_value: Dict[str, Any] = {}

    def record(self, key: str, value: Any) -> None:
        self.name_to_value[key] = value

    def dump(self, step: int = 0) -> None:
        for out in self.outputs:
            out.write(self.name_to_value, step)
        self.name_to_value.clear()

    def close(self) -> None:
        for out in self.outputs:
            out.close()


def configure_logger(folder: Optional[str] = None, format_strings=("stdout",),
                     tb_log_name: str = "run") -> Logger:
    """logger.configure equivalent (logger.py:602-639)."""
    outputs = []
    if folder:
        os.makedirs(folder, exist_ok=True)
    for fmt in format_strings:
        if fmt == "stdout":
            outputs.append(HumanOutput())
        elif fmt == "csv":
            outputs.append(CSVOutput(os.path.join(folder, "progress.csv")))
        elif fmt == "json":
            outputs.append(JSONOutput(os.path.join(folder, "progress.json")))
        elif fmt == "tensorboard":
            try:
                outputs.append(TensorBoardOutput(folder))
            except Exception:  # tensorboard missing -> degrade silently
                pass
    return Logger(outputs)


def unique_tb_dir(tensorboard_log: str, tb_log_name: str) -> str:
    """SB3-style auto-increment run dir <tb_log>/<name>_<k> (utils.py:166-198)."""
    os.makedirs(tensorboard_log, exist_ok=True)
    k = 1
    while os.path.exists(os.path.join(tensorboard_log, f"{tb_log_name}_{k}")):
        k += 1
    return os.path.join(tensorboard_log, f"{tb_log_name}_{k}")
