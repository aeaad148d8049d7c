"""Parity anchors against the reference's OWN shipped fixtures.

These tests read the read-only data files the reference asserts exact
outputs against (/root/reference/test/data/*) and inline the same literal
expected values (reference test_sampler.py:11-135,
test_dataloader.py:26-74) — the strongest cheap proof that parsing,
splitting, and pair loading behave identically.
"""

import os

import numpy as np
import pytest

from abnet3_tpu.dataloader import PairsDataLoader
from abnet3_tpu.sampler import SamplerClusterSiamese

REF_DATA = "/root/reference/test/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA),
    reason="reference fixture directory not available")

SPKID = {
    "s0101a": 1, "s0102a": 1, "s2001a": 20, "s2401a": 24, "s2402b": 24,
    "s2403b": 24, "s2404b": 24, "s2405b": 24, "s2403a": 24, "s2702a": 27,
}


def test_parse_english_classes_literal():
    """Exact cluster structure of english.test.classes
    (reference test_sampler.py:11-40)."""
    sampler = SamplerClusterSiamese()
    clusters = sampler.parse_input_file(
        os.path.join(REF_DATA, "english.test.classes"))
    assert clusters == [
        [["s0102a", 149.359, 149.66]],
        [["s2401a", 70.782, 71.282],
         ["s2402b", 14.639, 15.234],
         ["s2403b", 96.311, 96.739],
         ["s2404b", 96.311, 96.739],
         ["s2405b", 96.311, 96.739]],
        [["s2403a", 258.748, 259.267]],
        [["s0102a", 152.623, 153.083]],
        [["s2702a", 31.902, 32.37]],
        [["s0101a", 295.416, 295.955],
         ["s0101a", 546.471, 546.681]],
        [["s2001a", 217.712, 218.591],
         ["s2001a", 546.471, 546.681]],
    ]
    assert len(sampler.parse_input_file(
        os.path.join(REF_DATA, "english.test.classes"),
        max_num_clusters=3)) == 3


def test_split_cluster_ratio_conserves_words():
    """reference test_sampler.py:42-66."""
    path = os.path.join(REF_DATA, "english.test.classes")
    sampler = SamplerClusterSiamese()
    clusters = sampler.parse_input_file(path)
    n_words = sum(len(c) for c in clusters)

    train, dev = sampler.split_clusters_ratio(clusters)
    assert sum(len(c) for c in train) + sum(len(c) for c in dev) == n_words

    sampler = SamplerClusterSiamese(max_size_cluster=3)
    train, dev = sampler.split_clusters_ratio(clusters)
    assert sum(len(c) for c in train) + sum(len(c) for c in dev) == n_words
    assert max(len(c) for c in train) <= 3


def test_split_on_file_conserves_words():
    """reference test_sampler.py:68-105."""
    path = os.path.join(REF_DATA, "english.test.classes")
    sampler = SamplerClusterSiamese()
    clusters = sampler.parse_input_file(path)
    n_words = sum(len(c) for c in clusters)
    sampler.spkid_from_file = dict(SPKID)
    train, dev = sampler.split_clusters_on_file(clusters)
    assert sum(len(c) for c in train) + sum(len(c) for c in dev) == n_words


def test_split_each_file_literal():
    """Exact train/dev clusters of english.split.test.classes
    (reference test_sampler.py:108-135)."""
    sampler = SamplerClusterSiamese()
    clusters = sampler.parse_input_file(
        os.path.join(REF_DATA, "english.split.test.classes"))
    sampler.spkid_from_file = dict(SPKID)
    train, dev = sampler.split_each_file(clusters)
    assert train == [
        [["s0102a", 10.0, 20.0], ["s0102a", 40.0, 50.0]],
        [["s2401a", 10.0, 20.0], ["s2402b", 40.0, 50.0]]]
    assert dev == [[["s2402b", 75.0, 100.0]],
                   [["s0102a", 75.0, 100.0]]]


def test_pairs_knn_loading_literal():
    """Exact split of pairs_knn.txt, anchored to the EXECUTED reference
    implementation (reference dataloader.py:430-505 run on its own
    fixture with ratio 0.5 + id mapping).

    Note: the reference's shipped test asserts 12 train / 6 test
    (reference test_dataloader.py:26-30), but running the reference's
    own loader on this fixture yields the values below — that test is
    stale relative to its code (and its ratio-0.7 iterator test crashes
    on an empty test split). We anchor to executed behavior, not the
    stale literals."""
    pairs_path = os.path.join(REF_DATA, "dataloader/pairs_knn.txt")
    id_to_file = os.path.join(REF_DATA, "dataloader/id_to_file.txt")
    dl = PairsDataLoader(
        pairs_path=pairs_path, features_path=None, id_to_file=id_to_file,
        ratio_split_train_test=0.5, train_iterations=2, test_iterations=2,
        proportion_positive_pairs=0.5)
    dl.load_pairs()
    assert dl.pairs["train"] == [
        ["file1", 424, 500, "file1", 37540, 37638]]
    assert dl.pairs["test"] == [
        ["file0", 39159, 39221, "file0", 20051, 20060],
        ["file0", 39159, 39221, "file0", 20051, 20060],
        ["file0", 39165, 39239, "file2", 18994, 19086],
        ["file0", 39165, 39221, "file2", 18994, 19056],
        ["file0", 39159, 39221, "file3", 18994, 19056]]
    assert all(len(p) == 6 for p in dl.pairs["train"] + dl.pairs["test"])
    assert sorted(dl.tokens["train"], key=str) == [
        ("file1", 37540, 37638), ("file1", 424, 500)]
    assert len(dl.tokens["test"]) == 7

    # id mapping really applies to every loaded pair
    names = {f"file{i}" for i in range(5)}
    for pair in dl.pairs["train"] + dl.pairs["test"]:
        assert pair[0] in names
        assert pair[3] in names


class MockFeaturesAccessor:
    def get_between_frames(self, f, e, s):
        return np.ones((10, 3), np.float32)


def test_pairs_knn_iterator_counts():
    """batch_iterator yields exactly train/test_iterations batches
    (reference test_dataloader.py:49-74 — run at ratio 0.5: the shipped
    test's ratio 0.7 leaves the fixture's test split empty and crashes
    the reference's own iterator)."""
    pairs_path = os.path.join(REF_DATA, "dataloader/pairs_knn.txt")
    dl = PairsDataLoader(
        pairs_path=pairs_path, features_path=None, id_to_file=None,
        ratio_split_train_test=0.5, train_iterations=2, test_iterations=3,
        proportion_positive_pairs=0.5, batch_size=2,
        align_backend="host")
    dl.features = MockFeaturesAccessor()
    assert sum(1 for _ in dl.batch_iterator(train_mode=True)) == 2
    assert sum(1 for _ in dl.batch_iterator(train_mode=False)) == 3
