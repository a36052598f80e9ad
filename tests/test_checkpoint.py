import jax
import jax.numpy as jnp
import numpy as np

from grafp_tpu.core.config import Config
from grafp_tpu.models import build_model
from grafp_tpu.train import create_train_state
from grafp_tpu.train.checkpoint import load_ckp, save_ckp


def test_orbax_roundtrip(tmp_path):
    cfg = Config(fs=1000, win_len=256, hop_len=128, n_fft=256, n_mels=16,
                 n_frames=8)
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.key(0))
    payload = {
        "epoch": 7,
        "loss": [3.0, 2.5],
        "valid_acc": [0.1],
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    path = save_ckp(payload, "tc_test", str(tmp_path), "current")
    assert "model_tc_test_current" in path

    restored = load_ckp(path)
    assert restored["epoch"] == 7
    for a, b in zip(jax.tree.leaves(restored["params"]),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # best-tag naming like the reference (model_{name}_{best|epoch})
    p2 = save_ckp(payload, "tc_test", str(tmp_path), "best")
    assert p2.endswith("model_tc_test_best")
    p3 = save_ckp(payload, "tc_test", str(tmp_path), 42)
    assert p3.endswith("model_tc_test_42")
