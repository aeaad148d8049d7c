"""Tests for host utilities: parsers, distributions, cosine/DTW oracle."""

import numpy as np
import pytest

from abnet3_tpu import utils


def test_read_spkid_file(tmp_path):
    p = tmp_path / "spk.txt"
    p.write_text("f1 spkA\nf2 spkB\n")
    assert utils.read_spkid_file(str(p)) == {"f1": "spkA", "f2": "spkB"}


def test_read_spkid_file_duplicate(tmp_path):
    p = tmp_path / "spk.txt"
    p.write_text("f1 spkA\nf1 spkB\n")
    with pytest.raises(ValueError):
        utils.read_spkid_file(str(p))


def test_read_dataset_and_group(tmp_path):
    p = tmp_path / "dataset"
    p.write_text("fa 0.10 0.50 fb 1.00 1.40 same\n"
                 "fa 0.10 0.50 fc 2.00 2.30 diff\n")
    pairs = utils.read_dataset(str(p))
    assert pairs[0] == ("fa", 0.1, 0.5, "fb", 1.0, 1.4, "same")
    grouped = utils.group_pairs(pairs)
    assert len(grouped["same"]) == 1 and len(grouped["diff"]) == 1


def test_read_vad_file(tmp_path):
    p = tmp_path / "vad.csv"
    p.write_text("file,start,end\nf1,0.5,1.0\nf1,2.0,3.0\nf2,0.1,0.2\n")
    vad = utils.read_vad_file(str(p))
    assert vad["f1"] == [[0.5, 1.0], [2.0, 3.0]]
    assert vad["f2"] == [[0.1, 0.2]]


def test_distribution_helpers():
    p = {"a": 2.0, "b": 6.0}
    p = utils.normalize_distribution(p)
    assert p["a"] == pytest.approx(0.25)
    cdf = utils.cumulative_distribution(p)
    np.testing.assert_allclose(cdf, [0.25, 1.0])
    np.random.seed(0)
    idx = utils.sample_searchidx(cdf, 10000)
    # ~75% of samples should land on 'b'
    assert abs(np.mean(idx == 1) - 0.75) < 0.02


def test_cosine_distance_range_and_zero_norm():
    rng = np.random.RandomState(0)
    x = rng.randn(5, 8).astype(np.float32)
    y = rng.randn(7, 8).astype(np.float32)
    d = utils.cosine_distance(x, y)
    assert d.shape == (5, 7)
    assert np.all(d >= 0) and np.all(d <= 1)
    # identical vector -> 0 distance
    d2 = utils.cosine_distance(x, x)
    np.testing.assert_allclose(np.diag(d2), 0, atol=1e-3)
    # zero-norm handling (reference utils.py:55-58)
    xz = x.copy()
    xz[1] = 0
    yz = y.copy()
    yz[2] = 0
    dz = utils.cosine_distance(xz, yz)
    assert np.all(dz[1, :2] == 1.0) and np.all(dz[1, 3:] == 1.0)
    assert np.all(dz[[0, 2, 3, 4], 2] == 1.0)
    assert dz[1, 2] == 0.0


def test_dtw_identity():
    rng = np.random.RandomState(1)
    x = rng.randn(12, 6)
    d = utils.cosine_distance(x, x)
    cost, p1, p2 = utils.dtw_numpy(d)
    # aligning a sequence with itself must give the diagonal
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(p1, np.arange(12))
    assert cost == pytest.approx(0, abs=1e-6)


def test_dtw_monotone_and_boundary():
    rng = np.random.RandomState(2)
    d = rng.rand(9, 14)
    cost, p1, p2 = utils.dtw_numpy(d)
    assert p1[0] == 0 and p2[0] == 0
    assert p1[-1] == 8 and p2[-1] == 13
    assert np.all(np.diff(p1) >= 0) and np.all(np.diff(p2) >= 0)
    steps = np.stack([np.diff(p1), np.diff(p2)], 1)
    assert np.all(steps.max(1) == 1)  # every step advances
    # cost equals sum of costs along path
    assert cost == pytest.approx(d[p1, p2].sum())


def test_dtw_fast_matches_oracle():
    rng = np.random.RandomState(7)
    for _ in range(5):
        n1, n2 = rng.randint(1, 25, 2)
        d = rng.rand(n1, n2)
        c0, p10, p20 = utils.dtw_numpy(d)
        c1, p11, p21 = utils.dtw_numpy_fast(d)
        assert c1 == pytest.approx(c0, abs=1e-9)
        np.testing.assert_array_equal(p10, p11)
        np.testing.assert_array_equal(p20, p21)


def test_get_dtw_alignment():
    rng = np.random.RandomState(3)
    f1 = rng.randn(10, 4).astype(np.float32)
    f2 = rng.randn(15, 4).astype(np.float32)
    p1, p2 = utils.get_dtw_alignment(f1, f2)
    assert len(p1) == len(p2)
    assert p1[-1] == 9 and p2[-1] == 14


def test_expand_dimension_list():
    assert utils.expand_dimension_list([3, (5, 2), 7]) == [3, 5, 5, 7]
    with pytest.raises(TypeError):
        utils.expand_dimension_list(["x"])


def test_to_ordinal():
    assert utils.to_ordinal(1) == "1st"
    assert utils.to_ordinal(2) == "2nd"
    assert utils.to_ordinal(3) == "3rd"
    assert utils.to_ordinal(4) == "4th"
    assert utils.to_ordinal(11) == "11th"
    assert utils.to_ordinal(22) == "22nd"


def test_print_token():
    assert utils.print_token(("f1", 1.234, 5.678)) == "f1 1.23 5.68"


def test_get_var_name():
    foo = 3
    assert utils.get_var_name(foo=foo) == "foo"


def test_cast_features():
    feats = {"a": np.ones((3, 2), np.float64),
             "b": np.zeros((1, 2), np.int32)}
    out = utils.cast_features(feats)
    assert out is feats  # in-place, reference utils.py:228-237
    assert all(v.dtype == np.float32 for v in feats.values())


def test_sequential_partial_save():
    from abnet3_tpu import nn as tnn

    spec = tnn.TowerSpec([4, 6, 3], ["relu", "tanh"])
    tower = tnn.Tower(spec)
    import jax
    params, state = tower.init(jax.random.PRNGKey(0))
    net = utils.SequentialPartialSave(tower, params, state)
    x = np.asarray(np.random.RandomState(0).randn(5, 4), np.float32)
    out = net.forward(x)
    assert out.shape == (5, 3)
    # index 0 is the network input; index 1 the input of the 2nd Linear
    np.testing.assert_allclose(np.asarray(net.get_partial_result(0)), x)
    p1 = np.asarray(net.get_partial_result(1))
    assert p1.shape == (5, 6) and (p1 >= 0).all()  # post-relu
    # callable alias matches the reference's nn.Module call surface
    np.testing.assert_allclose(np.asarray(net(x)), np.asarray(out))
