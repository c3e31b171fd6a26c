"""End-to-end CLI smoke: tiny synthetic AVE run (decode -> device pipeline ->
train step -> eval -> checkpoint) completes and writes artifacts."""
import json
import os

from stgcma_tpu.cli import run_adapt_ave29


def test_ave_cli_synthetic(tmp_path):
    exp = str(tmp_path / "exp")
    trainer = run_adapt_ave29.main([
        "--synthetic", "True", "--tiny", "True", "--n-epochs", "1",
        "--batch_size", "2", "--synthetic_n", "4", "--exp-dir", exp,
        "--num_workers", "2",
    ])
    assert len(trainer.history) == 1
    assert os.path.exists(os.path.join(exp, "result.csv"))
    assert os.path.exists(os.path.join(exp, "args.json"))
    # experiment archive parity (AVE/run_adapt_ave29.py:193-196)
    assert os.path.exists(os.path.join(exp, "args.pkl"))
    with open(os.path.join(exp, "progress.json")) as f:
        prog = json.load(f)
    assert prog["history"][0]["epoch"] == 1
    # full per-class stats are NOT flattened into history/result.csv...
    assert "_stats" not in prog["history"][0]
    # ...but archived per epoch (AVE/traintest_adapt_ave29.py:243-244)
    import pickle
    with open(os.path.join(exp, "stats_1.pickle"), "rb") as f:
        stats = pickle.load(f)
    assert isinstance(stats, list) and "AP" in stats[0]


def test_ave_cli_resume(tmp_path):
    exp = str(tmp_path / "exp_r")
    args = ["--synthetic", "True", "--tiny", "True", "--batch_size", "2",
            "--synthetic_n", "4", "--exp-dir", exp, "--num_workers", "2"]
    run_adapt_ave29.main(args + ["--n-epochs", "1"])
    # resume continues to epoch 2 without redoing epoch 1
    t2 = run_adapt_ave29.main(args + ["--n-epochs", "2", "--resume", "True"])
    assert [h["epoch"] for h in t2.history] == [1, 2]


def test_avqa_cli_resume(tmp_path):
    """--resume restores epoch position + opt state for AVQA (VERDICT r4 #6:
    the reference has no resume at all — SURVEY §5; flag parity with AVE)."""
    from stgcma_tpu.cli import run_adapt_avqa
    exp = str(tmp_path / "exp_q")
    args = ["--synthetic", "True", "--tiny", "True", "--batch_size", "2",
            "--exp-dir", exp, "--num_workers", "2", "--num_frames", "2"]
    run_adapt_avqa.main(args + ["--n-epochs", "1"])
    t2 = run_adapt_avqa.main(args + ["--n-epochs", "2", "--resume", "True"])
    assert [h["epoch"] for h in t2.history] == [1, 2]


def test_avs_cli_resume(tmp_path):
    """--resume restores epoch position + opt state for AVS (VERDICT r4 #6)."""
    from stgcma_tpu.cli import run_adapt_avs
    exp = str(tmp_path / "exp_s")
    args = ["--synthetic", "True", "--tiny", "True", "--batch_size", "2",
            "--exp-dir", exp, "--num_workers", "2", "--num_frames", "2"]
    run_adapt_avs.main(args + ["--n-epochs", "1"])
    t2 = run_adapt_avs.main(args + ["--n-epochs", "2", "--resume", "True"])
    assert [h["epoch"] for h in t2.history] == [1, 2]
