"""MetricsLogger: JSONL/CSV records + optional TensorBoard event sink.

The reference logs via print/tqdm only (``main.py:331-335``); the
machine-readable writers are new observability capability, so their
formats are pinned here.
"""

import json

from sfc_vit_tpu.training.metrics_logger import MetricsLogger, _summary_writer


def test_jsonl_and_csv_roundtrip(tmp_path):
    lg = MetricsLogger(tmp_path, stdout=False, tensorboard=False)
    lg.log({"epoch": 1, "train_loss": 2.5, "images_per_sec": 100.0})
    lg.log({"epoch": 2, "train_loss": 1.5, "images_per_sec": 110.0})
    lg.close()

    lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
    recs = [json.loads(ln) for ln in lines]
    assert [r["epoch"] for r in recs] == [1, 2]
    assert all("wall_time" in r for r in recs)

    csv_lines = (tmp_path / "metrics.csv").read_text().splitlines()
    assert csv_lines[0].startswith("epoch,train_loss,images_per_sec")
    assert len(csv_lines) == 3  # header + 2 rows


def test_tensorboard_sink_writes_events(tmp_path):
    probe = _summary_writer(tmp_path / "probe")
    if probe is None:
        import pytest

        pytest.skip("no SummaryWriter backend on this image")
    probe.close()  # don't leak the writer thread
    lg = MetricsLogger(tmp_path, stdout=False, tensorboard=True)
    lg.log({"epoch": 1, "train_loss": 2.5, "note": "strings skipped"})
    lg.close()
    events = list((tmp_path / "tensorboard").glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0


def test_no_directory_is_stdout_only(capsys):
    lg = MetricsLogger(None, stdout=True)
    lg.log({"epoch": 1, "loss": 1.0})
    lg.close()
    assert "epoch=1" in capsys.readouterr().err
