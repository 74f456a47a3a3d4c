"""SAVQA_METRIC_HOOK external-tracker hook + ci_loader_scaling smoke
(VERDICT r4 weak #6 / r5 #6)."""

import importlib.util
import json
import os
import sys

import pytest


HOOK_MOD = """
CALLS = []

def log_metric(name, value, step):
    CALLS.append((name, value, step))

def angry(name, value, step):
    raise RuntimeError("tracker down")
"""


@pytest.fixture()
def hook_module(tmp_path, monkeypatch):
    path = tmp_path / "savqa_test_hook.py"
    path.write_text(HOOK_MOD)
    monkeypatch.syspath_prepend(str(tmp_path))
    sys.modules.pop("savqa_test_hook", None)
    yield "savqa_test_hook"
    sys.modules.pop("savqa_test_hook", None)


def test_hook_receives_every_log(tmp_path, monkeypatch, hook_module):
    monkeypatch.setenv("SAVQA_METRIC_HOOK", f"{hook_module}:log_metric")
    from structured_alignment_vqa_tpu.utils.logging import MetricLogger

    ml = MetricLogger(str(tmp_path / "out"))
    ml.log("loss", 1.5, step=1)
    ml.log("acc", 0.25, step=2)
    ml.log("no_step", 3.0)

    import savqa_test_hook

    assert savqa_test_hook.CALLS == [
        ("loss", 1.5, 1), ("acc", 0.25, 2), ("no_step", 3.0, None)]
    # the JSONL channel still wrote everything
    lines = [json.loads(l) for l in
             (tmp_path / "out" / "metrics.jsonl").read_text().splitlines()]
    assert [l["name"] for l in lines] == ["loss", "acc", "no_step"]


def test_raising_hook_warns_once_and_never_kills_logging(
        tmp_path, monkeypatch, hook_module, caplog):
    monkeypatch.setenv("SAVQA_METRIC_HOOK", f"{hook_module}:angry")
    from structured_alignment_vqa_tpu.utils.logging import MetricLogger

    ml = MetricLogger(str(tmp_path / "out"))
    with caplog.at_level("WARNING", logger="savqa"):
        ml.log("loss", 1.0, step=1)   # raises inside -> warned, swallowed
        ml.log("loss", 2.0, step=2)   # raises again -> silent
    warnings = [r for r in caplog.records if "metric hook raised" in r.message]
    assert len(warnings) == 1
    lines = (tmp_path / "out" / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 2  # both records written despite the dead tracker


def test_missing_hook_module_fails_at_startup(tmp_path, monkeypatch):
    monkeypatch.setenv("SAVQA_METRIC_HOOK", "no_such_module_xyz:log_metric")
    from structured_alignment_vqa_tpu.utils.logging import MetricLogger

    with pytest.raises(ModuleNotFoundError):
        MetricLogger(str(tmp_path / "out"))


def test_hook_only_on_process_zero(tmp_path, monkeypatch, hook_module):
    monkeypatch.setenv("SAVQA_METRIC_HOOK", f"{hook_module}:log_metric")
    from structured_alignment_vqa_tpu.utils.logging import MetricLogger

    ml = MetricLogger(str(tmp_path / "out"), process_index=1)
    ml.log("loss", 1.0, step=1)
    import savqa_test_hook

    assert savqa_test_hook.CALLS == []


def _load_ci_loader_scaling():
    spec = importlib.util.spec_from_file_location(
        "ci_loader_scaling",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "ci_loader_scaling.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ci_loader_scaling_fixture_and_timing_path(tmp_path, monkeypatch):
    """The CI script's fixture generation + inline (num_procs=0) timing path
    runs end-to-end here; the pool-speedup assertion itself needs a
    multi-core runner (the script self-skips on this box)."""
    mod = _load_ci_loader_scaling()
    from structured_alignment_vqa_tpu.data.fixtures import write_fixture

    root = str(tmp_path / "fixture")
    write_fixture(root, n_images=8, n_questions=32, seed=5,
                  n_obj_range=(6, 16), n_classes=128, bbox_bin_num=16)
    dt = mod.time_epoch(root, num_procs=0, batch_size=8)
    assert dt > 0


def test_ci_loader_scaling_skips_on_single_core(monkeypatch, capsys):
    mod = _load_ci_loader_scaling()
    monkeypatch.setattr(os, "cpu_count", lambda: 1)
    monkeypatch.setattr(sys, "argv", ["ci_loader_scaling.py"])
    assert mod.main() == 0
    assert "skipping" in capsys.readouterr().out
