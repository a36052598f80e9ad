"""Misc driver helpers with reference util.py contracts."""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def query_len_from_seconds(seconds: float, overlap: float, dur: float) -> int:
    """Reference util.py:103-105."""
    hop = dur * (1 - overlap)
    return int((seconds - dur) / hop + 1)


def seconds_from_query_len(query_len: int, overlap: float, dur: float) -> float:
    """Reference util.py:107-109."""
    hop = dur * (1 - overlap)
    return int((query_len - 1) * hop + dur)


def create_fp_dir(resume: Optional[str] = None, ckp=None, epoch=1,
                  train: bool = True, large: bool = False,
                  parent_dir: Optional[str] = None) -> str:
    """Fingerprint output dir layout, reference util.py:133-152
    (logs/store/{valid,medium,large}/model_<ckp>_epoch_<n>)."""
    if train:
        parent_dir = "logs/store/valid"
    else:
        if large:
            parent_dir = "logs/store/large"
        elif parent_dir is None:
            parent_dir = "logs/store/medium"
    os.makedirs(parent_dir, exist_ok=True)
    if resume is not None:
        ckp_name = resume.split("/")[-1].split(".pt")[0]
    else:
        ckp_name = f"model_{ckp}_epoch_{epoch}"
    fp_dir = os.path.join(parent_dir, ckp_name)
    os.makedirs(fp_dir, exist_ok=True)
    return fp_dir


def count_parameters(params, encoder: str = "grafp",
                     write_summary: bool = True) -> int:
    """Parameter table -> stdout + model_summary_<encoder>.txt (reference
    util.py:177-191, sans the prettytable dependency)."""
    from flax.traverse_util import flatten_dict

    rows = [("/".join(k), int(np.prod(v.shape)))
            for k, v in sorted(flatten_dict(params).items())]
    total = sum(n for _, n in rows)
    width = max((len(n) for n, _ in rows), default=10)
    lines = [f"{'Modules':{width}s} | Parameters", "-" * (width + 13)]
    lines += [f"{n:{width}s} | {c}" for n, c in rows]
    lines.append(f"Total Trainable Params: {total}")
    table = "\n".join(lines)
    print(table)
    if write_summary:
        with open(f"model_summary_{encoder}.txt", "w") as f:
            f.write(table)
    return total


class TensorBoardWriter:
    """Thin SummaryWriter wrapper (torch's tensorboard is in the image);
    degrades to stdout if tensorboard is unavailable."""

    def __init__(self, logdir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(logdir)
        except Exception:
            self._w = None
            self._dir = logdir

    def add_scalar(self, tag, value, step):
        if self._w:
            self._w.add_scalar(tag, value, step)
        else:
            print(f"[tb] {tag}@{step} = {value}")

    def add_text(self, tag, text, step):
        if self._w:
            self._w.add_text(tag, text, step)

    def close(self):
        if self._w:
            self._w.close()
