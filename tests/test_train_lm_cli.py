"""End-to-end smoke of the LM training CLI (reference ``main.py`` +
``z_scripts/e830M.sh``): argument parsing -> dataset/batcher wiring ->
training loop -> bundle checkpoint -> ``--resume``. The trainer internals
are parity-tested in test_training.py; this locks the entry point itself."""

import os

import pytest

from ssr_speech_tpu import train_lm
from tests.test_training import make_synth_corpus

TINY = [
    "--d_model", "64", "--nhead", "4", "--num_decoder_layers", "2",
    "--audio_vocab_size", "32", "--text_vocab_size", "40",
    "--n_codebooks", "4",
    "--num_epochs", "1", "--val_every_n_steps", "2",
    "--print_every_n_steps", "1", "--early_stop_step", "100000",
    "--max_num_tokens", "2000", "--num_buckets", "2",
    "--audio_min_length", "2.0", "--audio_max_length", "10.0",
    "--text_min_length", "5",
    "--optimizer_name", "scaledadam", "--lr", "0.01",
]


@pytest.mark.slow
def test_train_lm_cli_end_to_end(tmp_path):
    root = make_synth_corpus(tmp_path)
    exp = str(tmp_path / "exp")
    train_lm.main(["--exp_dir", exp, "--dataset_dir", root,
                   "--encodec_folder_name", "codes",
                   "--num_steps", "3",
                   "--deadlock_timeout", "600", "--profile_steps", "2",
                   "--keep_step_checkpoints", "2",
                   *TINY])
    assert os.path.isfile(os.path.join(exp, "bundle.pkl"))
    # the profiler traced the first 2 steps into exp_dir/profile
    prof_dir = os.path.join(exp, "profile")
    assert any(fs for _, _, fs in os.walk(prof_dir)), "no profiler trace"
    # keep-last-N numbered history exists and is discoverable
    from ssr_speech_tpu.utils.checkpoint import latest_checkpoint
    latest = latest_checkpoint(os.path.join(exp, "checkpoints"))
    assert latest and os.path.isfile(latest)

    # resume continues from the saved bundle (cur_step advances, no crash,
    # and the bundle is rewritten)
    before = os.path.getmtime(os.path.join(exp, "bundle.pkl"))
    train_lm.main(["--exp_dir", exp, "--dataset_dir", root,
                   "--encodec_folder_name", "codes", "--resume",
                   "--num_steps", "5", *TINY])
    assert os.path.getmtime(os.path.join(exp, "bundle.pkl")) >= before

    from ssr_speech_tpu.utils import checkpoint as ckpt
    bundle = ckpt.load_bundle(os.path.join(exp, "bundle.pkl"))
    assert bundle["model_config"]["d_model"] == 64
    assert bundle["phn2num"]  # vocab travels with the weights


@pytest.mark.slow
def test_train_lm_cli_flash_flags(tmp_path):
    """--attn_impl flash --remat dots flow through to the model config (on
    CPU the flash op numerically falls back to the reference einsum path)."""
    root = make_synth_corpus(tmp_path)
    exp = str(tmp_path / "exp_flash")
    train_lm.main(["--exp_dir", exp, "--dataset_dir", root,
                   "--encodec_folder_name", "codes", "--num_steps", "2",
                   "--attn_impl", "flash", "--remat", "dots", *TINY])
    from ssr_speech_tpu.utils import checkpoint as ckpt
    bundle = ckpt.load_bundle(os.path.join(exp, "bundle.pkl"))
    assert bundle["model_config"]["attn_impl"] == "flash"
    assert bundle["model_config"]["remat"] == "dots"
