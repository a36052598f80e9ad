"""CLI-level .pth checkpoint flow: a reference-schema torch checkpoint
(from the replica in test_torch_import) must load through the
unit_tests/model_test.py contract script and drive generate.py."""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.fixtures import make_wav_dir
from tests.test_torch_import import _build_torch_model, _randomize

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pth_ckpt(tmp_path_factory):
    tm = _build_torch_model()
    _randomize(tm)
    p = tmp_path_factory.mktemp("ckpt") / "model_ref_best.pth"
    torch.save({
        "epoch": 42,
        "loss": [1.0],
        "valid_acc": [0.5],
        "hit_rate": None,
        "state_dict": {"module." + k: v for k, v in tm.state_dict().items()},
    }, str(p))
    return str(p)


def test_model_test_script_loads_pth(pth_ckpt):
    from grafp_tpu.cli.test_fp_main import load_any_checkpoint
    from grafp_tpu.core.config import load_config
    from grafp_tpu.models import build_model

    cfg = load_config(os.path.join(REPO, "config", "grafp.yaml"))
    # the shipped config's production default is bfloat16; this test
    # applies the model EAGERLY (un-jitted), where the CPU thunk runtime
    # rejects batched bf16 dots - and the .pth import check doesn't need
    # production numerics anyway
    cfg["compute_dtype"] = "float32"
    model = build_model(cfg)
    params, batch_stats = load_any_checkpoint(pth_ckpt, model, cfg)
    import jax
    import jax.numpy as jnp

    h, z = model.apply({"params": params, "batch_stats": batch_stats},
                       jnp.zeros((1, 64, 32)), False)
    assert z.shape == (1, 128)
    assert np.isfinite(np.asarray(z)).all()


@pytest.mark.slow
def test_generate_cli_with_pth(pth_ckpt, tmp_path, monkeypatch):
    import yaml

    monkeypatch.chdir(tmp_path)
    make_wav_dir(str(tmp_path / "audio"), n=2, dur_s=2.5, sr=16000)
    os.makedirs("data", exist_ok=True)
    cfg = {
        "data_dir": "data", "arch": "grafp", "fs": 16000, "dur": 1.0,
        "offset": 0.05, "norm": 0.95, "win_len": 1024, "hop_len": 512,
        "n_mels": 64, "n_fft": 1024, "silence": 0.0005,
        "blur_kernel": [7, 7], "train_sz": 2, "val_sz": 2,
        "bsz_train": 2, "peak_stride": 2, "n_filters": 8,
        "n_frames": 32, "overlap": 0.9, "d": 128, "h": 1024, "u": 32,
        "error_threshold": 5,
    }
    with open("gen.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    from grafp_tpu.cli.generate_main import main as generate_main

    generate_main([
        "--config", "gen.yaml", "--test_dir", str(tmp_path / "audio"),
        "--ckp", pth_ckpt, "--output_dir", "out",
    ])
    fp = np.load("out/fingerprints.npy")
    # 2.5 s track -> frames 1+40000//512=79 -> segments (79-32)//3+1 = 16
    assert fp.shape == (32, 128)
    np.testing.assert_allclose(np.linalg.norm(fp, axis=1), 1.0, atol=1e-4)
