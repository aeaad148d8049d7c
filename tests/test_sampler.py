"""Sampler tests: parsing, splits, distributions, end-to-end pair export."""

import os

import numpy as np
import pytest

from abnet3_tpu.sampler import SamplerClusterSiamese
from abnet3_tpu.utils import read_dataset

CLASSES = """\
0 alpha
fileA 1.0 1.5

1 bravo
fileA 2.0 2.6
fileB 0.5 1.1
fileB 3.0 3.4
fileC 7.0 7.5

2 charlie
fileC 0.2 0.9
fileC 4.0 4.4

3 delta
fileB 8.0 8.8
fileA 5.0 5.9
fileA 7.1 7.8
fileD 2.2 2.9
"""

SPKID = {"fileA": "spk1", "fileB": "spk1", "fileC": "spk2", "fileD": "spk3"}


@pytest.fixture
def classes_file(tmp_path):
    p = tmp_path / "test.classes"
    p.write_text(CLASSES)
    return str(p)


@pytest.fixture
def spkid_file(tmp_path):
    p = tmp_path / "spk.txt"
    p.write_text("".join(f"{k} {v}\n" for k, v in SPKID.items()))
    return str(p)


def test_parse_input_file(classes_file):
    sampler = SamplerClusterSiamese()
    clusters = sampler.parse_input_file(input_file=classes_file)
    assert clusters == [
        [["fileA", 1.0, 1.5]],
        [["fileA", 2.0, 2.6], ["fileB", 0.5, 1.1], ["fileB", 3.0, 3.4],
         ["fileC", 7.0, 7.5]],
        [["fileC", 0.2, 0.9], ["fileC", 4.0, 4.4]],
        [["fileB", 8.0, 8.8], ["fileA", 5.0, 5.9], ["fileA", 7.1, 7.8],
         ["fileD", 2.2, 2.9]],
    ]
    assert len(sampler.parse_input_file(classes_file,
                                        max_num_clusters=2)) == 2


def test_split_clusters_ratio_conserves_tokens(classes_file):
    sampler = SamplerClusterSiamese()
    clusters = sampler.parse_input_file(classes_file)
    n_words = sum(len(c) for c in clusters)
    train, dev = sampler.split_clusters_ratio(clusters)
    assert sum(len(c) for c in train) + sum(len(c) for c in dev) == n_words

    sampler = SamplerClusterSiamese(max_size_cluster=3)
    train, dev = sampler.split_clusters_ratio(clusters)
    assert sum(len(c) for c in train) + sum(len(c) for c in dev) == n_words
    assert max(len(c) for c in train) <= 3


def test_split_on_file(classes_file):
    sampler = SamplerClusterSiamese()
    clusters = sampler.parse_input_file(classes_file)
    sampler.spkid_from_file = SPKID
    train, dev = sampler.split_clusters_on_file(clusters)
    n_words = sum(len(c) for c in clusters)
    assert sum(len(c) for c in train) + sum(len(c) for c in dev) == n_words
    # no file crosses the split
    train_files = {f for c in train for f, _, _ in c}
    dev_files = {f for c in dev for f, _, _ in c}
    assert not train_files & dev_files


def test_split_each_file(tmp_path):
    p = tmp_path / "split.classes"
    p.write_text("0 first\n"
                 "fileA 10.0 20.0\n"
                 "fileA 75.0 100.0\n"
                 "\n"
                 "1 second\n"
                 "fileB 10.0 20.0\n"
                 "fileB 90.0 95.0\n"
                 "\n")
    sampler = SamplerClusterSiamese(ratio_train_dev=0.7)
    clusters = sampler.parse_input_file(str(p))
    train, dev = sampler.split_each_file(clusters)
    # fileA max end 100 -> threshold 70; fileB max end 95 -> threshold 66.5
    assert train == [[["fileA", 10.0, 20.0]], [["fileB", 10.0, 20.0]]]
    assert dev == [[["fileA", 75.0, 100.0]], [["fileB", 90.0, 95.0]]]


def test_analyze_clusters(classes_file):
    sampler = SamplerClusterSiamese()
    clusters = sampler.parse_input_file(classes_file)
    descr = sampler.analyze_clusters(clusters, SPKID)
    assert len(descr["tokens"]) == 11
    assert descr["types"] == [1, 4, 2, 4]
    assert descr["speakers"] == {"spk1": 7, "spk2": 3, "spk3": 1}
    assert descr["tokens_type"] == [0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 3]
    # cluster 1 spans spk1 (A,B) + spk2 (C) -> 2 speakers
    assert descr["types_speakers"][1] == 2


def test_type_sample_p_modes(classes_file):
    sampler = SamplerClusterSiamese()
    clusters = sampler.parse_input_file(classes_file)
    descr = sampler.analyze_clusters(clusters, SPKID)
    for mode, f in [("1", lambda x: 1.0), ("f2", lambda x: x),
                    ("f", np.sqrt), ("fcube", np.cbrt),
                    ("log", np.log1p)]:
        p = sampler.type_sample_p(descr, type_sampling_mode=mode)
        counts = [1, 4, 2, 4]
        for k in range(4):
            assert p["Stype"][k] == pytest.approx(f(counts[k]))
        assert p["Dtype"][(1, 2)] == pytest.approx(f(4) * f(2))
        assert (0, 1) in p["Dtype"] and (1, 0) not in p["Dtype"]


def test_sample_spk_p_structure(classes_file):
    sampler = SamplerClusterSiamese()
    clusters = sampler.parse_input_file(classes_file)
    descr = sampler.analyze_clusters(clusters, SPKID)
    p = sampler.sample_spk_p(descr, spk_sampling_mode="log")
    # singleton (spk, type) entries have zero same-pair probability
    assert p["Stype_Sspk"][("spk1", 0)] == 0.0
    # (spk1, type1) has 3 tokens -> positive
    assert p["Stype_Sspk"][("spk1", 1)] == pytest.approx(np.log1p(3))
    # ordered speaker pairs both present for Stype_Dspk
    assert ("spk1", "spk2", 1) in p["Stype_Dspk"]
    assert ("spk2", "spk1", 1) in p["Stype_Dspk"]
    # type pairs sorted in Dtype_Sspk keys
    for key in p["Dtype_Sspk"]:
        assert key[1] < key[2]


def test_joint_distribution_normalized(classes_file):
    sampler = SamplerClusterSiamese()
    clusters = sampler.parse_input_file(classes_file)
    descr = sampler.analyze_clusters(clusters, SPKID)
    p = sampler.type_speaker_sampling_p(descr, type_sampling_mode="log",
                                        spk_sampling_mode="log")
    for config, dist in p.items():
        total = sum(dist.values())
        assert total == pytest.approx(1.0), config
        assert all(v >= 0 for v in dist.values())


def test_sample_end_to_end(classes_file, spkid_file, tmp_path):
    import random as pyrandom
    out = str(tmp_path / "pairs")
    # the train/dev split draws from the *global* RNGs (as in the
    # reference, which seeds only inside export_pairs) -> seed both
    np.random.seed(42)
    pyrandom.seed(42)
    sampler = SamplerClusterSiamese(
        std_file=classes_file, spkid_file=spkid_file,
        directory_output=out, seed=0, max_size_cluster=2,
        type_sampling_mode="log", spk_sampling_mode="log",
        ratio_same_diff_spk=0.5, ratio_same_diff_type=0.5,
        num_total_sampled_pairs=200)
    sampler.sample()
    train = read_dataset(os.path.join(out, "train_pairs", "dataset"))
    dev = read_dataset(os.path.join(out, "dev_pairs", "dataset"))
    assert len(train) > 0 and len(dev) > 0
    for f1, s1, e1, f2, s2, e2, ptype in train + dev:
        assert ptype in ("same", "diff")
        assert e1 > s1 and e2 > s2
        assert f1 in SPKID and f2 in SPKID
    # deterministic under the same seed
    out2 = str(tmp_path / "pairs2")
    np.random.seed(42)
    pyrandom.seed(42)
    sampler2 = SamplerClusterSiamese(
        std_file=classes_file, spkid_file=spkid_file,
        directory_output=out2, seed=0, max_size_cluster=2,
        type_sampling_mode="log", spk_sampling_mode="log",
        ratio_same_diff_spk=0.5, ratio_same_diff_type=0.5,
        num_total_sampled_pairs=200)
    sampler2.sample()
    train2 = read_dataset(os.path.join(out2, "train_pairs", "dataset"))
    assert train == train2


def test_sample_batches_mode(classes_file, spkid_file, tmp_path):
    """sample_batches=True writes pair_N.batch files instead of one
    dataset file (reference sampler.py:732-737)."""
    import glob
    out = str(tmp_path / "pairs")
    np.random.seed(1)
    import random as pyrandom
    pyrandom.seed(1)
    sampler = SamplerClusterSiamese(
        std_file=classes_file, spkid_file=spkid_file,
        directory_output=out, seed=0, max_size_cluster=2, batch_size=8,
        sample_batches=True, num_total_sampled_pairs=100)
    sampler.sample()
    batch_files = glob.glob(os.path.join(out, "train_pairs", "*.batch"))
    assert len(batch_files) > 0
    from abnet3_tpu.utils import Parse_Dataset, read_dataset
    listed = Parse_Dataset(os.path.join(out, "train_pairs"))
    assert sorted(listed) == sorted(batch_files)
    pairs = read_dataset(batch_files[0])
    assert 0 < len(pairs) <= 8


def test_sample_batch_ratios(classes_file):
    """Pair-config counts follow the same/diff ratios
    (reference sampler.py:634-645)."""
    sampler = SamplerClusterSiamese(ratio_same_diff_spk=0.75,
                                    ratio_same_diff_type=0.5, seed=0)
    clusters = sampler.parse_input_file(classes_file)
    descr = sampler.analyze_clusters(clusters, SPKID)
    token_dict = sampler.generate_token_dict(descr)
    proba = sampler.type_speaker_sampling_p(descr, "log", "log")
    cdf = sampler.compute_cdf(proba)
    sampled = sampler.sample_batch(proba, cdf, token_dict, num_samples=400)
    assert len(sampled["Stype_Sspk"]) == 50   # 400*0.25*0.5
    assert len(sampled["Dtype_Sspk"]) == 50
    assert len(sampled["Stype_Dspk"]) == 150  # 400*0.75*0.5
    assert len(sampled["Dtype_Dspk"]) == 150
    # same-type pairs really share a type; diff-speaker pairs differ
    for tok1, tok2 in sampled["Stype_Sspk"]:
        assert descr["tokens_type"][tok1] == descr["tokens_type"][tok2]
        assert tok1 != tok2
        assert (descr["tokens_speaker"][tok1]
                == descr["tokens_speaker"][tok2])
    for tok1, tok2 in sampled["Dtype_Dspk"]:
        assert descr["tokens_type"][tok1] != descr["tokens_type"][tok2]
        assert (descr["tokens_speaker"][tok1]
                != descr["tokens_speaker"][tok2])


def test_empty_split_writes_empty_dataset(classes_file, spkid_file,
                                          tmp_path):
    """split_method='files' on a corpus with too few files can leave the
    dev split EMPTY; export must write an empty pairs file with a
    warning instead of crashing in np.bincount (review finding)."""
    out = str(tmp_path / "pairs")
    sampler = SamplerClusterSiamese(
        std_file=classes_file, spkid_file=spkid_file,
        directory_output=out, seed=0, num_total_sampled_pairs=40)
    empty_descr = sampler.analyze_clusters([], {})
    os.makedirs(os.path.join(out, "dev_pairs"))
    sampler.export_pairs(out_dir=os.path.join(out, "dev_pairs"),
                         descr=empty_descr, type_sampling_mode="log",
                         spk_sampling_mode="log", seed=1, num_samples=20)
    from abnet3_tpu.utils import read_dataset
    assert read_dataset(os.path.join(out, "dev_pairs", "dataset")) == []


def test_sample_batches_covers_all_lines(classes_file, spkid_file,
                                         tmp_path):
    """Batch mode writes EVERY sampled pair (review finding: the
    reference's range(1, num//batch_size) dropped the final batch and
    wrote no file at all when num < 2*batch_size)."""
    import glob
    out = str(tmp_path / "pairs")
    np.random.seed(1)
    sampler = SamplerClusterSiamese(
        std_file=classes_file, spkid_file=spkid_file,
        directory_output=out, seed=0, max_size_cluster=2, batch_size=8,
        sample_batches=True, num_total_sampled_pairs=14)
    sampler.sample()
    # train split: 14 * 0.7 = 9 pairs < 2*batch_size — the old code
    # wrote ZERO .batch files here
    batch_files = sorted(glob.glob(os.path.join(out, "train_pairs",
                                                "*.batch")))
    assert batch_files, "final batch was dropped"
    total = sum(len(open(p).read().splitlines()) for p in batch_files)
    assert total >= 8  # all sampled train lines present (config rounding
    # can drop a line or two from the requested 9)
