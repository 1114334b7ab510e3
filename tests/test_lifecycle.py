"""Full train->serve lifecycle with framework-trained artifacts.

The one integration seam converter-based parity can't prove: a tiny
watermark codec GAN-trained in-repo and a tiny LM overfit in-repo drive
``inference/cli.py`` TTS + editing; ``detect_cli`` must flag exactly the
generated spans, and the overfit LM must reproduce its training utterance
token-level through the same loaded bundle. Mirrors the reference end-user
lifecycle (``/root/reference/README.md:195-249`` prep+train,
``inference_v2.py:191-363`` inference+watermark).

Runs the whole pipeline once (~8-10 min on the 1-core CI box, slow-marked)
via ``tools/lifecycle_rehearsal.py`` and asserts on its report.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def report(tmp_path_factory):
    import lifecycle_rehearsal

    out = str(tmp_path_factory.mktemp("lifecycle"))
    return lifecycle_rehearsal.main(["--out", out, "--codec_steps", "500",
                                     "--lm_steps", "220"])


@pytest.mark.slow
def test_lifecycle_overfit_lm_reproduces_training_utterance(report):
    # greedy TTS decode through the trained bundle regenerates the memorized
    # second half of utt0: token-exact modulo a frame or two of EOG slack
    assert report["token_match"] >= 0.9, report
    assert abs(report["token_gen_frames"] - report["token_truth_frames"]) <= 3


@pytest.mark.slow
def test_lifecycle_watermark_flags_generated_spans(report):
    # TTS output is 100% generated frames -> flagged nearly everywhere
    assert report["tts_flagged"] is True, report
    assert report["tts_wm_fraction"] >= 0.85, report
    # the original (never wmdecoded) recording stays clean
    assert report["clean_flagged"] is False, report
    assert report["clean_wm_fraction"] <= 0.15, report
    # the edit splice: unmarked original context, marked generated interior
    assert report["edit_prefix_fp"] <= 0.15, report
    assert report["edit_suffix_fp"] <= 0.15, report
    assert report["edit_gen_coverage"] >= 0.8, report


@pytest.mark.slow
def test_lifecycle_artifacts_and_stages(report):
    assert report["ok"]
    # the edit really replaced a middle span (mask derived by the CLI's own
    # host path; generated length solved from the detect frame counts)
    ms, me = report["edit_mask"]
    assert 0 < ms < me
    assert report["edit_gen_len"] > 0
