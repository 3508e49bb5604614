"""Config / logging / profiling utility tests."""

import json
import os
import time

from image_enhance_keras_tpu.utils.config import Config
from image_enhance_keras_tpu.utils.profiling import StageTimer, mpix_per_s
from image_enhance_keras_tpu.train.callbacks import HistoryLogger


def test_config_roundtrip(tmp_path):
    cfg = Config(model="difv4", lr=5e-4, augment=True)
    p = str(tmp_path / "cfg.json")
    cfg.save(p)
    back = Config.from_file(p)
    assert back == cfg


def test_config_override_ignores_none():
    cfg = Config()
    c2 = cfg.override(lr=None, batch_size=32)
    assert c2.lr == cfg.lr and c2.batch_size == 32


def test_stage_timer_accumulates():
    t = StageTimer()
    with t("a"):
        time.sleep(0.01)
    with t("a"):
        pass
    assert t.counts["a"] == 2
    assert t.totals["a"] >= 0.01
    assert "a:" in t.report()


def test_mpix_per_s():
    assert mpix_per_s(2_000_000, 2.0) == 1.0


def test_history_logger_append_and_reload(tmp_path):
    p = str(tmp_path / "h.json")
    h1 = HistoryLogger(p)
    h1.log_epoch(1, {"loss": 0.5})
    h2 = HistoryLogger(p)  # reload existing
    h2.log_epoch(2, {"loss": 0.25})
    with open(p) as f:
        data = json.load(f)
    assert data["epoch"] == [1, 2]
    assert data["loss"] == [0.5, 0.25]


def test_history_logger_corrupt_file(tmp_path):
    p = str(tmp_path / "h.json")
    with open(p, "w") as f:
        f.write("{broken")
    h = HistoryLogger(p)
    h.log_epoch(1, {"loss": 1.0})
    assert h.as_dict()["epoch"] == [1]


def test_find_repo_asset_cwd_independent(tmp_path, monkeypatch):
    """Repo-relative assets (demo checkpoints, data_set5) resolve from any
    working directory; CWD hits win; absolute misses stay None."""
    from image_enhance_keras_tpu.utils.paths import find_repo_asset

    monkeypatch.chdir(tmp_path)
    p = find_repo_asset("weights_Double/didbl_set5demo.npz")
    assert p is not None and p.startswith("/") and "didbl_set5demo" in p
    assert find_repo_asset("data_set5") is not None
    assert find_repo_asset("no_such_asset_anywhere") is None
    assert find_repo_asset(None) is None
    # a CWD-local file shadows the checkout
    (tmp_path / "data_set5").mkdir()
    assert find_repo_asset("data_set5") == "data_set5"
