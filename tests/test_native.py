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
