"""Roundtrip + append tests for the h5features-compatible container."""

import numpy as np
import pytest

from abnet3_tpu.io import (read_h5features, read_h5features_index,
                           read_h5features_item, write_h5features)


def _mk(n, d, seed):
    rng = np.random.RandomState(seed)
    feats = rng.randn(n, d).astype(np.float32)
    times = np.arange(n, dtype=np.float64) * 0.01 + 0.0025
    return feats, times


def test_roundtrip(tmp_path):
    path = str(tmp_path / "feats.h5f")
    f1, t1 = _mk(100, 40, 0)
    f2, t2 = _mk(150, 40, 1)
    write_h5features(path, "/features/", ["file1", "file2"], [t1, t2],
                     [f1, f2])

    data = read_h5features(path, "features")
    assert data.items() == ["file1", "file2"]
    np.testing.assert_allclose(data.dict_features()["file1"], f1)
    np.testing.assert_allclose(data.dict_features()["file2"], f2)
    np.testing.assert_allclose(data.dict_labels()["file2"], t2)


def test_append_batches(tmp_path):
    """The features pipeline writes in batches of files to one container
    (reference features.py:178-203)."""
    path = str(tmp_path / "feats.h5f")
    all_items, all_feats = [], {}
    for batch in range(3):
        items, times, feats = [], [], []
        for k in range(4):
            name = f"f{batch}_{k}"
            f, t = _mk(10 + k, 8, batch * 10 + k)
            items.append(name)
            times.append(t)
            feats.append(f)
            all_items.append(name)
            all_feats[name] = f
        write_h5features(path, "features", items, times, feats)

    assert read_h5features_index(path) == all_items
    data = read_h5features(path)
    for name in all_items:
        np.testing.assert_allclose(data.dict_features()[name],
                                   all_feats[name])


def test_single_item_read(tmp_path):
    path = str(tmp_path / "feats.h5f")
    f1, t1 = _mk(30, 5, 2)
    f2, t2 = _mk(20, 5, 3)
    write_h5features(path, "features", ["a", "b"], [t1, t2], [f1, f2])
    t, f = read_h5features_item(path, "b")
    np.testing.assert_allclose(f, f2)
    np.testing.assert_allclose(t, t2)
    with pytest.raises(KeyError):
        read_h5features_item(path, "zz")


def test_duplicate_item_rejected(tmp_path):
    path = str(tmp_path / "feats.h5f")
    f1, t1 = _mk(10, 4, 4)
    write_h5features(path, "features", ["a"], [t1], [f1])
    with pytest.raises(ValueError):
        write_h5features(path, "features", ["a"], [t1], [f1])


def test_iter_h5features_streams_exact_content(tmp_path):
    """iter_h5features yields the same (item, labels, features) triples
    read_h5features materializes, across chunk boundaries."""
    import numpy as np
    from abnet3_tpu.io import (iter_h5features, read_h5features,
                               write_h5features)
    rng = np.random.RandomState(0)
    path = str(tmp_path / "f.h5f")
    items = [f"it{i}" for i in range(7)]
    feats = [rng.randn(rng.randint(1, 30), 5).astype(np.float32)
             for _ in items]
    times = [np.arange(len(f)) * 0.01 for f in feats]
    write_h5features(path, "features", items, times, feats)
    full = read_h5features(path)
    streamed = list(iter_h5features(path, chunk_items=3))
    assert [s[0] for s in streamed] == full.items()
    for (it, labs, fs), wl, wf in zip(streamed, full.labels(),
                                      full.features()):
        np.testing.assert_array_equal(labs, wl)
        np.testing.assert_array_equal(fs, wf)


def test_label_count_mismatch_rejected(tmp_path):
    """A per-item label/feature row-count mismatch must be rejected at
    write time (review finding: it concatenated cleanly and wrote a
    container whose labels were silently shifted across items)."""
    path = str(tmp_path / "feats.h5f")
    f1, t1 = _mk(10, 4, 0)
    with pytest.raises(AssertionError, match="labels"):
        write_h5features(path, "features", ["a"],
                         [np.arange(11, dtype=np.float64)], [f1])
    import os
    assert not os.path.exists(path)  # nothing was written


def test_append_dim_mismatch_leaves_file_intact(tmp_path):
    """Appending a batch whose feature dim differs from the on-disk
    dataset must raise BEFORE any dataset mutates (review finding: the
    non-atomic append left items/labels longer than index/features,
    permanently misaligning the file)."""
    path = str(tmp_path / "feats.h5f")
    f1, t1 = _mk(10, 4, 0)
    write_h5features(path, "features", ["a"], [t1], [f1])
    f_bad, t_bad = _mk(8, 5, 1)
    with pytest.raises(ValueError, match="feature dim"):
        write_h5features(path, "features", ["b"], [t_bad], [f_bad])
    data = read_h5features(path)  # still consistent
    assert data.items() == ["a"]
    np.testing.assert_allclose(data.dict_features()["a"], f1)
    # and a correct retry still works
    f2, t2 = _mk(8, 4, 2)
    write_h5features(path, "features", ["b"], [t2], [f2])
    assert read_h5features(path).items() == ["a", "b"]


def test_many_appends_and_cached_lookups(tmp_path):
    """Batched exports append hundreds of times; the item-name caches
    must stay correct across appends (duplicate detection + per-item
    reads), including when a fresh writer reopens the same path."""
    path = str(tmp_path / "feats.h5f")
    want = {}
    for batch in range(20):
        name = f"f{batch}"
        f, t = _mk(5 + batch % 3, 4, batch)
        write_h5features(path, "features", [name], [t], [f])
        want[name] = f
        with pytest.raises(ValueError, match="already in"):
            write_h5features(path, "features", [name], [t], [f])
    assert read_h5features_index(path) == [f"f{b}" for b in range(20)]
    for name, f in want.items():
        _t, got = read_h5features_item(path, name)
        np.testing.assert_allclose(got, f)
    with pytest.raises(KeyError):
        read_h5features_item(path, "missing")
