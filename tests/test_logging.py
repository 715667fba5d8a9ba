"""MetricsLogger: JSONL always-on; one CSV file per metric schema so train
and val/* rows never interleave under one header (round-1 advisor finding)."""
import csv
import json

from nrhints_tpu.train.logging import MetricsLogger


def test_csv_one_file_per_schema(tmp_path):
    lg = MetricsLogger(tmp_path)
    lg.log({"loss": 1.0, "psnr": 10.0}, step=1)
    lg.log({"val/psnr": 20.0, "val/ssim": 0.9}, step=2)
    lg.log({"loss": 0.5, "psnr": 12.0}, step=3)
    lg.close()

    with open(tmp_path / "metrics.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert float(rows[0]["loss"]) == 1.0 and float(rows[1]["loss"]) == 0.5
    # No embedded header rows: every 'step' cell parses as an int.
    assert [int(r["step"]) for r in rows] == [1, 3]

    with open(tmp_path / "val_metrics.csv", newline="") as f:
        vrows = list(csv.DictReader(f))
    assert len(vrows) == 1 and float(vrows[0]["val/psnr"]) == 20.0

    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert len(lines) == 3


def test_csv_schema_change_gets_own_file(tmp_path):
    """A train-metrics schema that gains a field (rays_per_sec appears at the
    second logging interval) lands in a numbered sibling, not a re-headered
    metrics.csv."""
    lg = MetricsLogger(tmp_path)
    lg.log({"loss": 1.0}, step=1)
    lg.log({"loss": 0.9, "rays_per_sec": 100.0}, step=2)
    lg.log({"loss": 0.8}, step=3)
    lg.close()

    with open(tmp_path / "metrics.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    assert [int(r["step"]) for r in rows] == [1, 3]
    with open(tmp_path / "metrics_2.csv", newline="") as f:
        rows2 = list(csv.DictReader(f))
    assert len(rows2) == 1 and float(rows2[0]["rays_per_sec"]) == 100.0


def test_csv_resume_appends_without_duplicate_header(tmp_path):
    lg = MetricsLogger(tmp_path)
    lg.log({"loss": 1.0}, step=1)
    lg.close()
    lg2 = MetricsLogger(tmp_path)  # a resumed run reopens the same files
    lg2.log({"loss": 0.5}, step=2)
    lg2.close()

    text = (tmp_path / "metrics.csv").read_text()
    assert text.count("step") == 1  # single header line
    with open(tmp_path / "metrics.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    assert [int(r["step"]) for r in rows] == [1, 2]
