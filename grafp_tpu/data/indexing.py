"""Dataset/augmentation file indexing, reference-compatible.

Reproduces util.py:21-88,154-175 exactly: recursive glob, seeded shuffle
(np seed 42), truncation to train_sz/val_sz, JSON caches of
{str(i): abspath}, 0.8 train/test augmentation splits, and update_index
path rebasing - so the reference's frozen index artifacts
(data/fma_medium.json, *_indices.npy) load unchanged.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Sequence, Union

import numpy as np


def load_index(
    cfg,
    data_dir: str,
    ext: Sequence[str] = ("wav", "mp3"),
    shuffle_dataset: bool = True,
    mode: str = "train",
) -> Dict[str, str]:
    if data_dir.endswith(".json"):
        print(f"=>Loading indices from index file {data_dir}")
        with open(data_dir, "r") as fp:
            return json.load(fp)

    print(f"=>Loading indices from {data_dir}")
    if not os.path.exists(data_dir):
        raise FileNotFoundError(f"Directory {data_dir} not found")

    json_path = os.path.join(cfg["data_dir"], data_dir.split("/")[-1] + ".json")
    if os.path.exists(json_path):
        print(f"Loading indices from {json_path}")
        with open(json_path, "r") as fp:
            cached = json.load(fp)
        # Stale-cache guard (beyond reference util.py:30-34): the cache
        # is keyed by data_dir BASENAME only, so a cache written for a
        # different (since-deleted) dir of the same name shadows a fresh
        # corpus and every load "fails". If none of the first few cached
        # paths exist while data_dir does, re-index instead.
        sample = list(cached.values())[:8]
        if not sample or any(os.path.exists(p) for p in sample):
            return cached
        print(f"=>Stale index {json_path} (no cached path exists); "
              "re-indexing")

    fpaths = glob.glob(os.path.join(data_dir, "**/*.*"), recursive=True)
    fpaths = [p for p in fpaths if p.split(".")[-1] in ext]
    indices = list(range(len(fpaths)))
    if shuffle_dataset:
        np.random.seed(42)
        np.random.shuffle(indices)
    size = cfg["train_sz"] if mode == "train" else cfg["val_sz"]
    dataset = {str(i): fpaths[ix] for i, ix in enumerate(indices[:size])}
    os.makedirs(os.path.dirname(json_path) or ".", exist_ok=True)
    with open(json_path, "w") as fp:
        json.dump(dataset, fp)
    return dataset


def load_augmentation_index(
    data_dir: str,
    splits: Union[float, Sequence[float]],
    json_path: Optional[str] = None,
    ext: Sequence[str] = ("wav", "mp3"),
    shuffle_dataset: bool = True,
) -> Dict[str, List[str]]:
    dataset = {"train": [], "test": [], "validate": []}
    if json_path is None:
        json_path = os.path.join(data_dir, data_dir.split("/")[-1] + ".json")
    if not os.path.exists(json_path):
        fpaths = glob.glob(os.path.join(data_dir, "**/*.*"), recursive=True)
        fpaths = [p for p in fpaths if p.split(".")[-1] in ext]
        dataset_size = len(fpaths)
        indices = list(range(dataset_size))
        if shuffle_dataset:
            np.random.seed(42)
            np.random.shuffle(indices)
        if isinstance(splits, (list, tuple, np.ndarray)):
            # NB: faithful to the reference's arithmetic (util.py:70-73),
            # including its quirky third-split bounds.
            s = [int(splits[i] * dataset_size) for i in range(len(splits))]
            train_idxs = indices[: s[0]]
            valid_idxs = indices[s[0]: s[0] + s[1]]
            test_idxs = indices[s[1]:]
            dataset["validate"] = [fpaths[ix] for ix in valid_idxs]
        else:
            s = int(splits * dataset_size)
            train_idxs, test_idxs = indices[:s], indices[s:]
        dataset["train"] = [fpaths[ix] for ix in train_idxs]
        dataset["test"] = [fpaths[ix] for ix in test_idxs]
        with open(json_path, "w") as fp:
            json.dump(dataset, fp)
    else:
        with open(json_path, "r") as fp:
            dataset = json.load(fp)
    return dataset


def update_index(data_dir: str, idx_path: str) -> str:
    """Rebase absolute paths in an index JSON onto a new dataset root
    (reference util.py:154-175; used by setup_icassp)."""
    with open(idx_path, "r") as fp:
        index = json.load(fp)
    dir_name = idx_path.split("/")[-1].split(".")[0]
    new_index: Dict[str, Union[str, List[str]]] = {}
    if isinstance(list(index.values())[0], list):
        for key, value in index.items():
            new_index[key] = [
                os.path.join(data_dir, v.split(dir_name)[-1][1:]) for v in value
            ]
    else:
        for key, value in index.items():
            new_index[key] = os.path.join(data_dir, value.split(dir_name)[-1][1:])
    with open(idx_path, "w") as fp:
        json.dump(new_index, fp)
    return idx_path
