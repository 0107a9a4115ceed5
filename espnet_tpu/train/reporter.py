"""Metric reporter (reference: espnet2/train/reporter.py — SubReporter:114,
Reporter:258): epoch-keyed weighted averages, best-epoch tracking, early
stopping, optional tensorboard + matplotlib plots.
"""
from __future__ import annotations

import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np


class SubReporter:
    """Accumulates one phase (train/valid) of one epoch."""

    def __init__(self, phase: str, epoch: int):
        self.phase = phase
        self.epoch = epoch
        self._sums: Dict[str, float] = defaultdict(float)
        self._weights: Dict[str, float] = defaultdict(float)
        self._count = 0
        self._t0 = time.perf_counter()

    def register(self, stats: Dict[str, float], weight: float = 1.0):
        self._count += 1
        for k, v in stats.items():
            if v is None:
                continue
            v = float(v)
            if not np.isfinite(v):
                continue
            self._sums[k] += v * weight
            self._weights[k] += weight

    @property
    def count(self) -> int:
        return self._count

    def mean(self, key: str) -> Optional[float]:
        if self._weights.get(key, 0) == 0:
            return None
        return self._sums[key] / self._weights[key]

    def finalize(self) -> Dict[str, float]:
        out = {k: self._sums[k] / self._weights[k] for k in self._sums}
        out["time"] = time.perf_counter() - self._t0
        return out

    def log_message(self, step: Optional[int] = None) -> str:
        parts = [
            f"{k}={self._sums[k] / self._weights[k]:.3f}"
            for k in sorted(self._sums)
        ]
        prefix = f"{self.phase} epoch {self.epoch}"
        if step is not None:
            prefix += f" step {step}"
        return f"{prefix}: " + ", ".join(parts)


class Reporter:
    """Epoch-keyed store: {epoch: {phase: {metric: value}}}."""

    def __init__(self):
        self.stats: Dict[int, Dict[str, Dict[str, float]]] = {}
        self.epoch = 0

    def start_epoch(self, phase: str, epoch: int) -> SubReporter:
        self.epoch = max(self.epoch, epoch)
        return SubReporter(phase, epoch)

    def finish_epoch(self, sub: SubReporter):
        self.stats.setdefault(sub.epoch, {})[sub.phase] = sub.finalize()

    def get(self, epoch: int, phase: str, key: str) -> Optional[float]:
        return self.stats.get(epoch, {}).get(phase, {}).get(key)

    def sorted_epochs(
        self, phase: str, key: str, mode: str = "min"
    ) -> List[Tuple[int, float]]:
        vals = [
            (e, p[phase][key])
            for e, p in self.stats.items()
            if phase in p and key in p[phase]
        ]
        return sorted(vals, key=lambda x: x[1], reverse=(mode == "max"))

    def best_epoch(self, phase: str, key: str, mode: str = "min") -> Optional[int]:
        s = self.sorted_epochs(phase, key, mode)
        return s[0][0] if s else None

    def check_early_stopping(
        self, patience: int, phase: str, key: str, mode: str = "min"
    ) -> bool:
        best = self.best_epoch(phase, key, mode)
        if best is None:
            return False
        return (self.epoch - best) > patience

    def state_dict(self) -> dict:
        return {"stats": self.stats, "epoch": self.epoch}

    def load_state_dict(self, d: dict):
        self.stats = {int(k): v for k, v in d["stats"].items()}
        self.epoch = d["epoch"]

    def save_json(self, path: Path):
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(self.state_dict(), indent=2, default=float))

    def matplotlib_plot(self, output_dir: Path):
        """Per-metric train/valid curves (reference reporter.py:467)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        keys = set()
        for p in self.stats.values():
            for ph in p.values():
                keys.update(ph.keys())
        for key in keys:
            plt.figure()
            for phase in ("train", "valid"):
                pts = [
                    (e, p[phase][key])
                    for e, p in sorted(self.stats.items())
                    if phase in p and key in p[phase]
                ]
                if pts:
                    plt.plot(*zip(*pts), label=phase, marker="x")
            plt.xlabel("epoch")
            plt.ylabel(key)
            plt.legend()
            plt.grid()
            plt.savefig(output_dir / f"{key}.png")
            plt.close()


def plot_attention(att_ws, output_path, uid: str = ""):
    """Save an attention heatmap PNG (reference: PlotAttentionReport,
    espnet/asr/pytorch_backend/asr.py:687, transformer/plot.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    att = np.asarray(att_ws)
    if att.ndim == 2:
        att = att[None]
    n = att.shape[0]
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 4))
    if n == 1:
        axes = [axes]
    for i, ax in enumerate(axes):
        ax.imshow(att[i], aspect="auto", origin="lower")
        ax.set_xlabel("encoder frame")
        ax.set_ylabel("decoder step")
        ax.set_title(f"{uid} head{i}" if n > 1 else uid)
    Path(output_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(output_path)
    plt.close(fig)
