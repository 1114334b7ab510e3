"""Native C++ runtime ops: build, parse, alignment parity with the python DP."""

import numpy as np
import pytest

from ssr_speech_tpu import native
from ssr_speech_tpu.inference import edit


def test_native_builds():
    assert native.available(), "g++ build of ssr_native.cpp failed"


def test_parse_int_matrix(tmp_path):
    path = str(tmp_path / "codes.txt")
    with open(path, "w") as f:
        f.write("1 2 3 4 5\n10 20 30 40 50\n7 8 9 10 11\n-1 0 1 2 3\n")
    m = native.parse_int_matrix(path, max_rows=4)
    np.testing.assert_array_equal(
        m, [[1, 2, 3, 4, 5], [10, 20, 30, 40, 50], [7, 8, 9, 10, 11],
            [-1, 0, 1, 2, 3]]
    )


def test_parse_int_matrix_big(tmp_path):
    rng = np.random.default_rng(0)
    want = rng.integers(0, 2048, size=(4, 1000))
    path = str(tmp_path / "big.txt")
    with open(path, "w") as f:
        for row in want:
            f.write(" ".join(str(v) for v in row) + "\n")
    got = native.parse_int_matrix(path, max_rows=4)
    np.testing.assert_array_equal(got, want)


def test_parse_missing_file():
    assert native.parse_int_matrix("/nonexistent/x.txt") is None


def test_levenshtein_matches_python_dp():
    rng = np.random.default_rng(1)
    for _ in range(30):
        n, m = rng.integers(0, 15, size=2)
        a = [str(v) for v in rng.integers(0, 6, size=n)]
        b = [str(v) for v in rng.integers(0, 6, size=m)]
        got = edit.align_ops(a, b)  # native path
        # force the python DP by mapping through unavailable native:
        ids = {t: i for i, t in enumerate(dict.fromkeys(a + b))}
        want = edit.align_ops.__wrapped__(a, b) if hasattr(edit.align_ops, "__wrapped__") else None
        if want is None:
            # recompute with python fallback via private DP: temporarily
            # monkeypatch availability
            import ssr_speech_tpu.native as nat

            real = nat.available
            nat.available = lambda: False
            try:
                want = edit.align_ops(a, b)
            finally:
                nat.available = real
        assert got == want, (a, b, got, want)


def test_pad_collate():
    rows = [np.arange(3), np.arange(7), np.arange(1)]
    out = native.pad_collate(rows, width=5, pad_value=-7)
    np.testing.assert_array_equal(out[0], [0, 1, 2, -7, -7])
    np.testing.assert_array_equal(out[1], [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(out[2], [0, -7, -7, -7, -7])
