"""Numerical parity of the JAX SSR LM against the PyTorch reference.

Builds the reference SSR_Speech with a tiny config and random weights,
converts the state dict with ``models.convert.convert_ssr_lm``, then checks:
  - training forward loss/ntokens match (reference models/ssr.py:280-379),
  - the full inference token stream is IDENTICAL under greedy decoding
    (top_k=1 makes ``torch.multinomial`` deterministic), covering the delay
    pattern, sentinel bookkeeping, constrained-logit state machine, KV cache
    and strided CFG (reference models/ssr.py:504-812).

Skipped when /root/reference is absent.
"""

from argparse import Namespace

import numpy as np
import pytest

from ssr_speech_tpu.config import DecodeConfig, TokenSpace, tiny_ssr_config
from ssr_speech_tpu.inference import decode
from ssr_speech_tpu.models import convert
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.ops import patterns

from .reference_loader import REFERENCE_ROOT, load_reference_lm

pytestmark = pytest.mark.skipif(
    not REFERENCE_ROOT.is_dir(), reason="reference tree not mounted"
)

CFG = tiny_ssr_config()
TS = CFG.tokens


def ref_args(predict_mask_token=1, predict_all=0):
    v = TS.audio_vocab_size
    return Namespace(
        n_special=5,
        audio_vocab_size=v,
        empty_token=v, eog=v + 1, audio_pad_token=v + 2, eos=v + 3,
        sos=v + 4, mts=v + 5, max_n_spans=TS.max_n_spans,
        text_vocab_size=CFG.text_vocab_size,
        text_pad_token=CFG.text_vocab_size,
        n_codebooks=CFG.n_codebooks,
        d_model=CFG.d_model, nhead=CFG.nhead,
        num_decoder_layers=CFG.num_layers,
        audio_embedding_dim=CFG.d_model,
        text_embedding_dropout=0.0, audio_embedding_dropout=0.0,
        text_positional_embedding_dropout=0.0,
        audio_positional_embedding_dropout=0.0, trm_dropout=0.0,
        predict_mask_token=predict_mask_token, predict_all=predict_all,
        codebook_weight=None, shuffle_mask_embedding=0,
    )


@pytest.fixture(scope="module")
def ref_and_params():
    import torch

    ref = load_reference_lm()
    torch.manual_seed(0)
    model = ref.ssr.SSR_Speech(ref_args()).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert.convert_ssr_lm(sd, CFG)
    return ref, model, params


def test_head_hidden_dim_matches_reference():
    # reference predict head hidden = audio_vocab_size // 2 (models/ssr.py:177)
    assert CFG.head_hidden_dim == 32 or CFG.head_hidden is not None


def test_forward_loss_parity(ref_and_params):
    import torch

    _, model, params = ref_and_params
    rng = np.random.default_rng(0)
    B, sx = 2, 14
    x = rng.integers(0, CFG.text_vocab_size, size=(B, sx))
    x_lens = np.array([sx, sx - 3])
    x[1, -3:] = CFG.text_pad_token
    ys, y_lens = [], []
    for b in range(B):
        t = int(rng.integers(12, 18))
        raw = rng.integers(0, TS.audio_vocab_size, size=(CFG.n_codebooks, t))
        cated, _ = patterns.build_lm_sequence(raw, [(3, 7)], TS)
        ys.append(cated)
        y_lens.append(cated.shape[1])
    sy = max(y_lens)
    y = np.full((B, CFG.n_codebooks, sy), TS.pad, np.int64)
    for b in range(B):
        y[b, :, : y_lens[b]] = ys[b]

    batch_t = {
        "x": torch.from_numpy(x).long(),
        "x_lens": torch.from_numpy(np.asarray(x_lens)).long(),
        "y": torch.from_numpy(y).long(),
        "y_lens": torch.from_numpy(np.asarray(y_lens)).long(),
    }
    with torch.no_grad():
        want = model(batch_t)

    out = ssr_model.ssr_forward(
        params, CFG,
        dict(x=x, x_lens=np.asarray(x_lens), y=y.transpose(0, 2, 1),
             y_lens=np.asarray(y_lens)),
        deterministic=True, predict_mask_token=True, predict_all=False,
    )
    assert int(out["effective_ntoken"]) == int(want["effective_ntoken"])
    np.testing.assert_allclose(
        float(out["loss"]), float(want["loss"]), rtol=2e-4
    )


@pytest.mark.parametrize(
    "aug_text,cfg_stride,mask",
    [
        (False, 1, [(8, 15)]),
        (True, 1, [(8, 15)]),
        (True, 3, [(8, 15)]),
        (False, 1, [(5, 10), (18, 24)]),
        (True, 2, [(5, 10), (18, 24)]),
    ],
)
def test_greedy_token_stream_parity(ref_and_params, aug_text, cfg_stride, mask):
    """Bit-exact greedy token streams vs the reference decode loop."""
    import torch

    _, model, params = ref_and_params
    rng = np.random.default_rng(7)
    T = 32
    y = rng.integers(0, TS.audio_vocab_size, size=(CFG.n_codebooks, T))
    x = rng.integers(0, CFG.text_vocab_size - 1, size=(20,))

    mask_t = torch.tensor(mask).unsqueeze(0)
    with torch.no_grad():
        res, marks, masks, nmi = model.inference(
            torch.from_numpy(x[None]).long(),
            torch.tensor([len(x)]),
            torch.zeros(1, 0).long(),
            torch.tensor([0]),
            torch.from_numpy(y.T[None]).long(),  # [1, T, K]
            torch.from_numpy(y.T[None]).long(),
            mask_interval=mask_t,
            top_k=1, top_p=1.0, temperature=1.0,
            stop_repetition=-1, kvcache=1,
            cfg_coef=1.5, cfg_stride=cfg_stride,
            aug_text=aug_text, aug_context=False, cfg_pretrained=True,
        )

    dec = DecodeConfig(
        top_k=1, top_p=1.0, temperature=1.0, stop_repetition=-1,
        cfg_coef=1.5, cfg_stride=cfg_stride, aug_text=aug_text,
        cfg_pretrained=True, max_gen_per_span=400, length_cap_mult=10,
    )
    import jax

    codes, marks_j, out_iv, nm = decode.generate(
        params, CFG, dec, x, y, mask, jax.random.PRNGKey(0),
        dtype_name="float32",
    )
    np.testing.assert_array_equal(codes[0], res[0].numpy())
    np.testing.assert_array_equal(marks_j[0], marks[0].numpy())


def test_zh_edit_path_token_stream_parity(ref_and_params):
    """BASELINE config 4 machinery end-to-end: char-level Mandarin spans
    (parse_edit_zh, reference edit_utils_zh.py:103-118) -> frame mask
    intervals -> greedy decode with aug_text + cfg_stride=1 (reference
    inference_v2.py:206), token stream bit-exact vs torch."""
    import torch

    from ssr_speech_tpu.inference import edit as edit_mod
    from ssr_speech_tpu.inference import pipeline

    _, model, params = ref_and_params
    orig = "今天天气很好我们去公园散步"
    target = "今天天气真好我们去海边走走"
    spans = edit_mod.parse_edit_zh(orig, target)
    assert spans == [(4, 5), (9, 13)]  # substitution + tail rewrite, merged

    # cmn-style phoneme vocab: one id per char (the Mandarin bundles map
    # chars through phn2num the same way)
    vocab = {c: i for i, c in enumerate(sorted(set(orig + target)))}
    assert len(vocab) < CFG.text_vocab_size
    x = np.asarray([vocab[c] for c in target], np.int64)

    # synthetic per-char forced alignment, 0.2 s per char
    words = [(c, i * 0.2, (i + 1) * 0.2) for i, c in enumerate(orig)]
    dur = len(orig) * 0.2
    mask = pipeline.spans_to_mask_intervals(words, spans, dur, codec_sr=50)
    T = int(dur * 50)
    assert mask[-1][1] == T  # second span reaches the utterance end

    rng = np.random.default_rng(21)
    y = rng.integers(0, TS.audio_vocab_size, size=(CFG.n_codebooks, T))

    with torch.no_grad():
        res, marks, masks, nmi = model.inference(
            torch.from_numpy(x[None]).long(),
            torch.tensor([len(x)]),
            torch.zeros(1, 0).long(),
            torch.tensor([0]),
            torch.from_numpy(y.T[None]).long(),
            torch.from_numpy(y.T[None]).long(),
            mask_interval=torch.tensor(mask).unsqueeze(0),
            top_k=1, top_p=1.0, temperature=1.0,
            stop_repetition=-1, kvcache=1,
            cfg_coef=1.5, cfg_stride=1,
            aug_text=True, aug_context=False, cfg_pretrained=True,
        )

    dec = DecodeConfig(
        top_k=1, top_p=1.0, temperature=1.0, stop_repetition=-1,
        cfg_coef=1.5, cfg_stride=1, aug_text=True,
        cfg_pretrained=True, max_gen_per_span=400, length_cap_mult=10,
    )
    import jax

    codes, marks_j, out_iv, nm = decode.generate(
        params, CFG, dec, x, y, mask, jax.random.PRNGKey(0),
        dtype_name="float32",
    )
    np.testing.assert_array_equal(codes[0], res[0].numpy())
    np.testing.assert_array_equal(marks_j[0], marks[0].numpy())


@pytest.mark.parametrize("aug_text", [False, True])
def test_aug_context_token_stream_parity(ref_and_params, aug_text):
    """aug_context: prompt audio+text prepended when the masked content is
    short (reference models/ssr.py:563-593,806-810)."""
    import torch

    _, model, params = ref_and_params
    rng = np.random.default_rng(11)
    y = rng.integers(0, TS.audio_vocab_size, size=(CFG.n_codebooks, 28))
    x = rng.integers(0, CFG.text_vocab_size - 1, size=(18,))
    prompt_y = rng.integers(0, TS.audio_vocab_size, size=(CFG.n_codebooks, 12))
    prompt_x = rng.integers(0, CFG.text_vocab_size - 1, size=(9,))
    mask = [(8, 15)]  # 7 frames < 2*50 -> context activates

    with torch.no_grad():
        res, marks, masks, nmi = model.inference(
            torch.from_numpy(x[None]).long(),
            torch.tensor([len(x)]),
            torch.from_numpy(prompt_x[None]).long(),
            torch.tensor([len(prompt_x)]),
            torch.from_numpy(y.T[None]).long(),
            torch.from_numpy(prompt_y.T[None]).long(),
            mask_interval=torch.tensor(mask).unsqueeze(0),
            top_k=1, top_p=1.0, temperature=1.0,
            stop_repetition=-1, kvcache=1,
            cfg_coef=1.5, cfg_stride=2,
            aug_text=aug_text, aug_context=True, cfg_pretrained=True,
        )

    dec = DecodeConfig(
        top_k=1, top_p=1.0, temperature=1.0, stop_repetition=-1,
        cfg_coef=1.5, cfg_stride=2, aug_text=aug_text, aug_context=True,
        cfg_pretrained=True, max_gen_per_span=400, length_cap_mult=10,
    )
    import jax

    codes, marks_j, out_iv, nm = decode.generate(
        params, CFG, dec, x, y, mask, jax.random.PRNGKey(0),
        prompt_x=prompt_x, prompt_y=prompt_y, dtype_name="float32",
    )
    np.testing.assert_array_equal(codes[0], res[0].numpy())
    np.testing.assert_array_equal(marks_j[0], marks[0].numpy())
