"""CLI entry smoke tests: each entry runs in-process on the synthetic
fixture with a tiny config and produces its artifact contract."""

import json
import os
from pathlib import Path

import numpy as np
import pytest


TINY = ["--esm-config", "tiny", "--esm-dtype", "float32"]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cliwork")
    old = os.getcwd()
    os.chdir(d)
    yield d
    os.chdir(old)


@pytest.fixture(scope="module")
def trained_run(workdir):
    from protein_clip_tpu.cli.main_2protein import main
    rc = main(TINY + [
        "--epochs", "2", "--batch-size", "4", "--accumulated-batches", "2",
        "--num-chunks", "2", "--length-groups", "2",
        "--synthetic-fixture", "--data-dir", "data",
        "--fixture-families", "40",
    ])
    assert rc == 0
    runs = sorted(Path("runs").iterdir())
    assert runs
    return runs[-1]


def test_training_artifacts(trained_run):
    csv = (trained_run / "losses_per_epoch.txt").read_text().strip()
    lines = csv.split("\n")
    assert lines[0] == "Epoch,Train Loss,Validation Loss"
    assert len(lines) == 3
    for line in lines[1:]:
        epoch, tr, va = line.split(",")
        assert np.isfinite(float(tr)) and np.isfinite(float(va))
    assert (trained_run / "best_model.npz").exists()
    figures = list((trained_run / "figures").glob("figure *.png"))
    assert len(figures) >= 5
    # raw matrices saved alongside similarity heatmaps
    assert list((trained_run / "figures").glob("*.npy"))
    metrics = [json.loads(l) for l in
               (trained_run / "metrics.jsonl").read_text().splitlines()]
    assert len(metrics) == 2 and metrics[0]["epoch"] == 1


def test_cosine_similarity_entry(workdir, trained_run):
    from protein_clip_tpu.cli.cosine_similarity import main
    rc = main(TINY + [
        "--checkpoint", str(trained_run / "best_model.npz"),
        "--data-dir", "data", "--batch-size", "4",
    ])
    assert rc == 0


def test_topk_entry(workdir, trained_run, capsys):
    from protein_clip_tpu.cli.topk import main
    rc = main(TINY + [
        "--checkpoint", str(trained_run / "best_model.npz"),
        "--data-dir", "data", "--batch-size", "4",
        "--n-candidates", "16", "--split", "train",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "top-1 accuracy:" in out


def test_mlm_sweep_entry(workdir, trained_run, capsys):
    from protein_clip_tpu.cli.mlm_sweep import main
    rc = main(["--data-dir", "data", "--prefix", "protein1"])
    assert rc == 0
    assert "mean changed fraction" in capsys.readouterr().out


def test_resume_entry(workdir, trained_run):
    from protein_clip_tpu.cli.main_2protein import main
    rc = main(TINY + [
        "--epochs", "3", "--batch-size", "4", "--accumulated-batches", "2",
        "--num-chunks", "2", "--length-groups", "2",
        "--data-dir", "data", "--resume-dir", str(trained_run),
    ])
    assert rc == 0
    csv = (trained_run / "losses_per_epoch.txt").read_text().strip()
    lines = csv.split("\n")
    assert len(lines) == 4  # header + 3 epochs (2 restored + 1 new)
    assert lines[-1].startswith("3,")


def test_packed_training_entry(workdir, trained_run):
    """--packed path through the real CLI (fresh run dir)."""
    from protein_clip_tpu.cli.main_2protein import main
    rc = main(TINY + [
        "--epochs", "1", "--batch-size", "4", "--accumulated-batches", "2",
        "--num-chunks", "2", "--packed", "--data-dir", "data",
        "--runs-dir", "runs_packed",
    ])
    assert rc == 0
    run = sorted(Path("runs_packed").iterdir())[-1]
    csv = (run / "losses_per_epoch.txt").read_text().strip().split("\n")
    assert len(csv) == 2 and csv[1].startswith("1,")
    _, tr, va = csv[1].split(",")
    assert np.isfinite(float(tr)) and np.isfinite(float(va))
