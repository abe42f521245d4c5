"""Console/file logging + optional wandb (parity: io_utils/logging.py).

Three channels like the reference: python logging (console+file),
scalar/image logging to wandb behind an availability flag, and the
``log_iter`` console formatter. Metrics arrive as host numpy values —
callers fetch them off-device asynchronously.
"""

from __future__ import annotations

import logging as _logging
import sys
import time
from pathlib import Path
from typing import Any, Dict, Optional

_LOGGER = _logging.getLogger("codeps_tpu")

try:
    import wandb as _wandb
    _HAS_WANDB = True
except ImportError:  # pragma: no cover
    _wandb = None
    _HAS_WANDB = False


def init_logging(log_dir: Optional[str] = None, debug: bool = False) -> None:
    """Console + optional file handler (io_utils/logging.py:21-43)."""
    _LOGGER.setLevel(_logging.DEBUG if debug else _logging.INFO)
    _LOGGER.propagate = False  # avoid duplicate lines via the root logger
    _LOGGER.handlers.clear()
    console = _logging.StreamHandler(sys.stdout)
    console.setFormatter(_logging.Formatter(
        "%(asctime)s %(levelname)s: %(message)s", "%H:%M:%S"))
    _LOGGER.addHandler(console)
    if log_dir is not None:
        Path(log_dir).mkdir(parents=True, exist_ok=True)
        handler = _logging.FileHandler(str(Path(log_dir) / "run.log"))
        handler.setFormatter(_logging.Formatter(
            "%(asctime)s %(levelname)s: %(message)s"))
        _LOGGER.addHandler(handler)


def log_info(message: str, *args, **kwargs) -> None:
    # forward kwargs (exc_info=..., extra=...) instead of swallowing them
    _LOGGER.info(message, *args, **kwargs)


def log_iter(step: int, total_steps: int, metrics: Dict[str, Any],
             prefix: str = "train", lr: Optional[float] = None,
             elapsed: Optional[float] = None) -> None:
    """One console line per log interval (io_utils/logging.py:80-121)."""
    parts = [f"[{prefix}] {step}/{total_steps}"]
    if lr is not None:
        parts.append(f"lr={lr:.6f}")
    for key, value in metrics.items():
        try:
            parts.append(f"{key}={float(value):.4f}")
        except (TypeError, ValueError):
            continue
    if elapsed is not None:
        parts.append(f"{elapsed:.2f}s/it")
    _LOGGER.info(" ".join(parts))


class WandbLogger:
    """Thin optional wandb sink (misc/train_utils.py:62-78 init parity)."""

    def __init__(self, project: Optional[str] = None,
                 entity: Optional[str] = None,
                 run_name: Optional[str] = None, enabled: bool = False,
                 config: Optional[dict] = None):
        self.enabled = enabled and _HAS_WANDB
        self.run = None
        self._depth_series: Dict = {}
        if self.enabled:
            self.run = _wandb.init(project=project, entity=entity,
                                   name=run_name, config=config)

    def log_scalars(self, mode: str, losses: Optional[Dict] = None,
                    metrics: Optional[Dict] = None, step: int = 0) -> None:
        if not self.enabled:
            return
        payload = {}
        for group, values in (("losses", losses), ("metrics", metrics)):
            if not values:
                continue
            for key, value in values.items():
                try:
                    payload[f"{mode}_{group}/{key}"] = float(value)
                except (TypeError, ValueError):
                    continue
        self.run.log(payload, step=step)

    def log_images(self, prefix: str, images: Dict[str, Any],
                   step: int = 0) -> None:
        if not self.enabled:
            return
        self.run.log({f"{prefix}/{k}": _wandb.Image(v)
                      for k, v in images.items()}, step=step)

    def log_panoptic_table(self, mode: str, panoptic_scores: Dict,
                           remove_classes, label_mode: str,
                           step: int = 0) -> None:
        """Per-class PQ/SQ/RQ table (io_utils/logging.py:196-213)."""
        if not self.enabled:
            return
        from codeps_tpu.data.labels import get_labels
        id2name = {label.trainId: label.name
                   for label in get_labels(remove_classes, label_mode)}
        columns, pq, sq, rq = [""], ["PQ"], ["SQ"], ["RQ"]
        for category, scores in panoptic_scores.get("per_class",
                                                    {}).items():
            columns.append(id2name.get(category, str(category)))
            pq.append(scores["pq"])
            sq.append(scores["sq"])
            rq.append(scores["rq"])
        table = _wandb.Table(data=[pq, sq, rq], columns=columns)
        self.run.log({f"{mode}_metrics/panoptic": table}, step=step)

    def log_depth_per_class(self, metrics: Dict[str, float],
                            remove_classes, label_mode: str,
                            step: int = 0) -> None:
        """Per-semantic-class depth line series
        (io_utils/logging.py:215-308): accumulates d_<metric>_c<i> values
        across calls and logs wandb line_series plots keyed by class
        name."""
        if not self.enabled:
            return
        from codeps_tpu.data.labels import get_labels
        id2name = {label.trainId: label.name
                   for label in get_labels(remove_classes, label_mode)}
        series = self._depth_series
        for key, value in metrics.items():
            if not key.startswith("d_") or "_c" not in key:
                continue
            metric, _, cls = key.rpartition("_c")
            try:
                name = id2name.get(int(cls), f"c{cls}")
                value = float(value)
            except (TypeError, ValueError):
                continue
            entry = series.setdefault(metric, {"xs": [], "ys": {}})
            if step not in entry["xs"]:
                entry["xs"].append(step)
            # Invariant: every per-class list stays exactly len(xs)
            # long. A step logged twice (e.g. the final flush landing on
            # an interval multiple) REPLACES the last point — appending
            # would desync xs/ys and shift every per-class line; a
            # late-appearing class is back-filled with its first value.
            lst = entry["ys"].setdefault(name, [])
            while len(lst) < len(entry["xs"]) - 1:
                lst.append(value)
            if len(lst) == len(entry["xs"]):
                lst[-1] = value
            else:
                lst.append(value)
        payload = {}
        for metric, entry in series.items():
            keys = list(entry["ys"])
            payload[metric] = _wandb.plot.line_series(
                xs=entry["xs"], ys=[entry["ys"][k] for k in keys],
                keys=keys, title=metric)
        if payload:
            self.run.log(payload, step=step)

    def finish(self) -> None:
        if self.enabled and self.run is not None:
            self.run.finish()


class Timer:
    """data_time / batch_time instrumentation
    (scripts/train_codeps.py:79-94)."""

    def __init__(self):
        self.start = time.time()

    def elapsed(self) -> float:
        now = time.time()
        delta = now - self.start
        self.start = now
        return delta
