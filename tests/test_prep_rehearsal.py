"""End-to-end data-prep rehearsal smoke: synthetic wavs -> prep encode/
phonemize/filemaker/vocab -> train_lm consuming the artifacts
(tools/prep_rehearsal.py; reference README.md:195-249 pipeline order)."""

import json
import os

import pytest


@pytest.mark.slow
def test_prep_rehearsal_tiny_end_to_end(tmp_path):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import prep_rehearsal

    out = str(tmp_path / "r")
    report = prep_rehearsal.main(
        ["--out", out, "--n_utts", "6", "--tiny", "--train_steps", "2",
         "--batch_size", "4"])
    assert report["ok"]
    assert report["kept_utts"] >= 5  # min_frames can drop at most the shortest
    # artifacts exist and are consistent
    ds = os.path.join(out, "dataset")
    vocab = open(os.path.join(ds, "vocab.txt")).read().splitlines()
    assert len(vocab) > 10
    with open(os.path.join(out, "report.json")) as f:
        assert json.load(f)["n_utts"] == 6
    # tag round trip reached the phoneme files (utt00000 carries a tag)
    phn0 = open(os.path.join(ds, "phonemes", "utt00000.txt")).read()
    assert any(t in phn0.split(" ") for t in ("<MUSIC>", "<SIL>")), phn0
    # train consumed them: a bundle checkpoint was written
    assert any(f.endswith(".pkl") for f in os.listdir(os.path.join(out, "exp")))
