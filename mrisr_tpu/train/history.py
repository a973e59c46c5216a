"""Training history artifacts: JSON + loss-curve PNG.

Keeps the reference's artifact contract (SURVEY.md §5 "Metrics / logging"):
per-run history JSON with the config embedded
(``results/*_history.json``) and a loss-curve PNG
(`/root/reference/src/unet_model.py:267-298`).
"""

from __future__ import annotations

import dataclasses
import json
import os
from datetime import datetime
from typing import Any, Dict, List, Optional


def _to_jsonable(x):
    if dataclasses.is_dataclass(x) and not isinstance(x, type):
        return dataclasses.asdict(x)
    if isinstance(x, dict):
        return {k: _to_jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_to_jsonable(v) for v in x]
    if hasattr(x, "item"):
        return x.item()
    return x


class TrainingHistory:
    """Accumulates per-epoch scalar series + arbitrary final fields."""

    def __init__(self, config: Optional[dict] = None):
        self.series: Dict[str, List[float]] = {}
        self.extra: Dict[str, Any] = {}
        self.config = config or {}

    def append(self, **metrics: float) -> None:
        for k, v in metrics.items():
            self.series.setdefault(k, []).append(float(v))

    def set(self, **fields: Any) -> None:
        self.extra.update(fields)

    def to_dict(self) -> dict:
        return _to_jsonable(
            {
                **self.series,
                **self.extra,
                "config": self.config,
                "timestamp": datetime.now().isoformat(),
            }
        )

    def save_json(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    def save_curves_png(
        self, path: str, keys=("train_loss", "val_loss"), title: str = "Training"
    ) -> None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:  # plotting is best-effort
            return
        plt.figure(figsize=(10, 6))
        for k in keys:
            if k in self.series:
                plt.plot(self.series[k], label=k.replace("_", " "), linewidth=2)
        plt.xlabel("Epoch")
        plt.ylabel("Loss")
        plt.title(title)
        plt.legend()
        plt.grid(True, alpha=0.3)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        plt.savefig(path, dpi=150, bbox_inches="tight")
        plt.close()
