"""Native C++ host runtime: parity with the numpy implementations."""

import numpy as np
import pytest

from abnet3_tpu import native, utils

pytestmark = pytest.mark.skipif(
    native._load() is None, reason="no C++ toolchain available")


def test_cosine_distance_parity():
    rng = np.random.RandomState(0)
    x = rng.randn(9, 12).astype(np.float32)
    y = rng.randn(7, 12).astype(np.float32)
    x[3] = 0.0
    y[2] = 0.0
    got = native.cosine_distance(x, y)
    want = utils.cosine_distance(x, y)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_dtw_parity():
    rng = np.random.RandomState(1)
    for n1, n2 in [(1, 1), (1, 8), (12, 7), (30, 30)]:
        dist = rng.rand(n1, n2)
        c0, p10, p20 = utils.dtw_numpy(dist)
        c1, p11, p21 = native.dtw(dist)
        assert c1 == pytest.approx(c0, abs=1e-9)
        np.testing.assert_array_equal(p10, p11)
        np.testing.assert_array_equal(p20, p21)


def test_dtw_align_parity():
    rng = np.random.RandomState(2)
    f1 = rng.randn(14, 6).astype(np.float32)
    f2 = rng.randn(9, 6).astype(np.float32)
    p1n, p2n = native.dtw_align(f1, f2)
    p1p, p2p = utils.get_dtw_alignment(f1, f2)
    np.testing.assert_array_equal(p1n, p1p)
    np.testing.assert_array_equal(p2n, p2p)


def test_pad_batch():
    rng = np.random.RandomState(3)
    table = rng.randn(50, 5).astype(np.float32)
    offsets = np.array([0, 10, 30], np.int64)
    lens = np.array([10, 20, 7], np.int32)
    out = native.pad_batch(table, offsets, lens, T=16)
    assert out.shape == (3, 16, 5)
    np.testing.assert_array_equal(out[0, :10], table[0:10])
    np.testing.assert_array_equal(out[0, 10:], 0)
    np.testing.assert_array_equal(out[1], table[10:26])  # truncated to 16
    np.testing.assert_array_equal(out[2, :7], table[30:37])


def test_parse_pairs(tmp_path):
    p = tmp_path / "dataset"
    p.write_text("fa 0.10 0.50 fb 1.00 1.40 same\n"
                 "fa 0.10 0.50 fc 2.00 2.30 diff\n"
                 "\n"
                 "fb 3.00 3.25 fa 0.70 0.90 same\n")
    names, f1, s1, e1, f2, s2, e2, same = native.parse_pairs(str(p))
    assert names == ["fa", "fb", "fc"]
    assert f1.tolist() == [0, 0, 1]
    assert f2.tolist() == [1, 2, 0]
    assert same.tolist() == [1, -1, 1]
    np.testing.assert_allclose(s1, [0.1, 0.1, 3.0], rtol=1e-6)
    np.testing.assert_allclose(e2, [1.4, 2.3, 0.9], rtol=1e-6)
    # parity with the python parser
    pairs = utils.read_dataset(str(p))
    assert len(pairs) == 3
    assert pairs[2][0] == "fb"


def test_parse_pairs_malformed(tmp_path):
    p = tmp_path / "bad"
    p.write_text("fa 0.1 0.5 fb 1.0 1.4 same\n"
                 "fa 0.1 0.5 fb 1.0 1.4 banana\n")
    with pytest.raises(ValueError, match="line 2"):
        native.parse_pairs(str(p))


def test_parse_pairs_line_numbers_blank_and_crlf(tmp_path):
    """The -(line number) error points at the right line even after
    blank lines and with CRLF terminators (one terminator consumed per
    record, blank lines counted)."""
    p = tmp_path / "bad_after_blanks"
    p.write_text("fa 0.1 0.5 fb 1.0 1.4 same\n"
                 "\n"
                 "\n"
                 "fa 0.1 0.5 fb 1.0 1.4 banana\n")
    with pytest.raises(ValueError, match="line 4"):
        native.parse_pairs(str(p))

    p2 = tmp_path / "bad_crlf"
    p2.write_bytes(b"fa 0.1 0.5 fb 1.0 1.4 same\r\n"
                   b"fb 0.2 0.6 fa 1.1 1.5 diff\r\n"
                   b"oops\r\n")
    with pytest.raises(ValueError, match="line 3"):
        native.parse_pairs(str(p2))

    # CRLF + blank CRLF lines parse cleanly and count correctly
    p3 = tmp_path / "ok_crlf"
    p3.write_bytes(b"fa 0.1 0.5 fb 1.0 1.4 same\r\n"
                   b"\r\n"
                   b"fb 0.2 0.6 fa 1.1 1.5 diff\r\n")
    names, f1, s1, e1, f2, s2, e2, same = native.parse_pairs(str(p3))
    assert same.tolist() == [1, -1]
    assert names == ["fa", "fb"]


def test_native_faster_than_python_dtw():
    """Best-of-3 timing (tolerant to background load on shared CI)."""
    rng = np.random.RandomState(4)
    import time
    f1 = rng.randn(100, 40).astype(np.float32)
    f2 = rng.randn(100, 40).astype(np.float32)
    native.dtw_align(f1, f2)  # warm

    def best(fn, repeats=3, iters=10):
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(iters):
                fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    def py_path():
        dist = utils.cosine_distance(f1, f2)
        utils.dtw_numpy_fast(dist)

    t_native = best(lambda: native.dtw_align(f1, f2))
    t_py = best(py_path)
    assert t_native < t_py


def test_parse_pairs_rejects_corrupt_numeric_columns(tmp_path):
    """The C++ parser must fail loudly on non-numeric start/end fields,
    matching the pure-Python parser (review finding: strtod without an
    endptr check read 'abc' as 0.0 and trained on a wrong token span)."""
    from abnet3_tpu import native
    if native._load() is None:
        pytest.skip("no C++ toolchain")
    p = str(tmp_path / "bad")
    with open(p, "w") as fh:
        fh.write("f1 abc 0.5 f2 0.2 0.6 same\n")
    with pytest.raises(ValueError, match="line 1"):
        native.parse_pairs(p)


def test_parse_pairs_handles_cr_only_line_endings(tmp_path):
    """Lone-'\\r' line endings parse (the parser accepts them, so the
    wrapper must size its pair buffers counting them too — review
    finding: a '\\n'-only count under-sized the buffers and misreported
    'malformed line 2' on a well-formed old-Mac file)."""
    from abnet3_tpu import native
    if native._load() is None:
        pytest.skip("no C++ toolchain")
    p = str(tmp_path / "mac")
    with open(p, "wb") as fh:
        fh.write(b"f1 0.1 0.5 f2 0.2 0.6 same\r"
                 b"f3 0.0 0.3 f4 0.1 0.4 diff\r")
    names, f1, s1, e1, f2, s2, e2, same = native.parse_pairs(p)
    assert names == ["f1", "f2", "f3", "f4"]
    assert len(f1) == 2 and same.tolist() == [1, -1]


# ---------------------------------------------------------------------------
# differential fuzz: the C++ parser vs the pure-Python reference parser
# ---------------------------------------------------------------------------

def _native_read(path):
    """read_dataset through the C++ parser only (no Python fallback)."""
    parsed = native.parse_pairs(path)
    assert parsed is not None
    names, f1, s1, e1, f2, s2, e2, same = parsed
    return [(names[a], float(b), float(c), names[d], float(e), float(f),
             "same" if g > 0 else "diff")
            for a, b, c, d, e, f, g in zip(f1, s1, e1, f2, s2, e2, same)]


def _norm(rows):
    """nan-safe comparison form (nan != nan under ==)."""
    return [tuple(repr(x) if isinstance(x, float) else x for x in r)
            for r in rows]


def _agree(tmp_path, text, i):
    p = str(tmp_path / f"fuzz{i}.txt")
    with open(p, "w", newline="") as fh:
        fh.write(text)
    try:
        want = utils.read_dataset_python(p)
        want_err = None
    except ValueError:
        want = None
        want_err = True
    try:
        got = _native_read(p)
        got_err = None
    except ValueError:
        got = None
        got_err = True
    assert got_err == want_err, (
        f"accept/reject disagreement on {text!r}: "
        f"python={'reject' if want_err else want} "
        f"c++={'reject' if got_err else got}")
    if want is not None:
        assert _norm(got) == _norm(want), f"value disagreement on {text!r}"


def test_parse_pairs_python_parity_cases(tmp_path):
    """Deterministic divergence candidates: every whitespace/numeric shape
    where strip().split(' ') + float() (reference utils.py:156-173) and a
    naive C scanner would part ways."""
    cases = [
        "f1 0.1 0.2 f2 0.3 0.4 same\n",          # plain valid
        "f1 0.1 0.2 f2 0.3 0.4 diff",            # no trailing newline
        "f1 0.1  0.2 f2 0.3 0.4 same\n",         # double space: 8 tokens
        "a 1 2  3 4 same\n",                     # empty token on a NAME col
        "  f1 0.1 0.2 f2 0.3 0.4 same\n",        # leading spaces (strip)
        "f1 0.1 0.2 f2 0.3 0.4 same   \n",       # trailing spaces (strip)
        "\tf1 0.1 0.2 f2 0.3 0.4 same\n",        # leading tab (strip)
        "f1 0.1 0.2 f2 0.3 0.4 same\t\n",        # trailing tab (strip)
        "f1 0.1\t 0.2 f2 0.3 0.4 same\n",        # tab INSIDE numeric token
        "f\t1 0.1 0.2 f2 0.3 0.4 same\n",        # tab inside a name token
        "f1 0x10 0.2 f2 0.3 0.4 same\n",         # hex float: float() rejects
        "f1 1_0 0.2 f2 0.3 0.4 same\n",          # PEP 515 underscore
        "f1 1_ 0.2 f2 0.3 0.4 same\n",           # trailing underscore: bad
        "f1 1__0 0.2 f2 0.3 0.4 same\n",         # double underscore: bad
        "f1 inf 0.2 f2 -inf nan same\n",         # inf/nan accepted by both
        "f1 .5 5. f2 +0.3 -4e-2 diff\n",         # bare-dot / sign / exp
        "f1 1e 0.2 f2 0.3 0.4 same\n",           # dangling exponent: bad
        "f1 1.2.3 0.2 f2 0.3 0.4 same\n",        # double dot: bad
        "f1 abc 0.2 f2 0.3 0.4 same\n",          # corrupt column: bad
        "f1 0.1 0.2 f2 0.3 0.4 Same\n",          # wrong-case type: bad
        "f1 0.1 0.2 f2 0.3 0.4 samex\n",         # type superstring: bad
        "f1 0.1 0.2 f2 0.3 0.4\n",               # 6 columns: bad
        "f1 0.1 0.2 f2 0.3 0.4 same extra\n",    # 8 columns: bad
        "\n\nf1 0.1 0.2 f2 0.3 0.4 same\n\n",    # blank lines skipped
        "   \n",                                 # whitespace-only line
        "",                                      # empty file
        "f1 0.1 0.2 f2 0.3 0.4 same\r\nf3 1 2 f4 3 4 diff\r\n",  # CRLF
    ]
    for i, text in enumerate(cases):
        _agree(tmp_path, text, i)


def test_parse_pairs_differential_fuzz(tmp_path):
    """Randomized differential fuzz: generated pair files (valid lines +
    whitespace/numeric/column mutations) must be accepted with identical
    values or rejected by BOTH parsers. Lone-'\\r' line endings are the
    one documented divergence (the C++ parser accepts old-Mac files the
    line-iterating Python path cannot split) and are not generated."""
    rng = np.random.RandomState(1234)
    names = ["f1", "tok-2", "a.b", "x" * 30, "émü", "f_3"]
    numbers = ["0.1", "-3.25", "1e4", "-4e-2", ".5", "5.", "+2", "inf",
               "nan", "1_000", "0x1p2", "abc", "1e", "1.2.3", "", "7\t"]
    types = ["same", "diff", "Same", "samex", "sam", ""]

    def line(valid):
        if valid:
            toks = [rng.choice(names),
                    f"{rng.rand():.4f}", f"{rng.rand():.4f}",
                    rng.choice(names),
                    f"{rng.rand():.4f}", f"{rng.rand():.4f}",
                    ("same", "diff")[rng.randint(2)]]
        else:
            toks = [rng.choice(names), rng.choice(numbers),
                    rng.choice(numbers), rng.choice(names),
                    rng.choice(numbers), rng.choice(numbers),
                    rng.choice(types)]
            k = rng.randint(4)
            if k == 0 and len(toks) > 1:
                toks.pop(rng.randint(len(toks)))      # drop a column
            elif k == 1:
                toks.insert(rng.randint(len(toks)), "9")  # extra column
        s = " ".join(toks)
        if rng.rand() < 0.2:
            s = " " * rng.randint(1, 3) + s           # leading ws
        if rng.rand() < 0.2:
            s = s + "\t" * rng.randint(1, 3)          # trailing ws
        if rng.rand() < 0.15:
            i = rng.randint(len(s))
            s = s[:i] + " " + s[i:]                   # injected space
        return s

    for trial in range(60):
        n_lines = rng.randint(0, 6)
        eol = "\r\n" if rng.rand() < 0.2 else "\n"
        body = eol.join(line(rng.rand() < 0.6) for _ in range(n_lines))
        if rng.rand() < 0.8:
            body += eol
        if rng.rand() < 0.2:
            body = eol + body                          # leading blank line
        _agree(tmp_path, body, 100 + trial)
