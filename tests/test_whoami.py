"""Reproducibility-dump audit: every non-private constructor argument
of every loader/sampler/trainer class must appear in its whoami()
(round-3 review weak #7: OnDeviceSamplerDataLoader omitted five of its
constructor params; the reference's whoami idiom dumps everything,
reference dataloader.py:60-84, sampler.py:47-56, trainer.py:101-117)."""

import inspect

import pytest

from abnet3_tpu.dataloader import (FramesDataLoader, MultimodalDataLoader,
                                   MultiTaskDataLoader,
                                   OnDeviceSamplerDataLoader,
                                   OriginalDataLoader, PairsDataLoader,
                                   TemporalCoherenceDataLoader)
from abnet3_tpu.loss import coscos2
from abnet3_tpu.models import SiameseNetwork
from abnet3_tpu.sampler import (DummySampler, SamplerCluster,
                                SamplerClusterSiamese, SamplerPairs)
from abnet3_tpu.trainer import (MultimodalTrainer, TrainerSiamese,
                                TrainerSiameseMultitask)


def _constructor_args(cls):
    """Non-private constructor parameter names across the MRO."""
    names = set()
    for c in cls.__mro__:
        init = c.__dict__.get("__init__")
        if init is None:
            continue
        for name, p in inspect.signature(init).parameters.items():
            if name == "self" or name.startswith("_"):
                continue
            if p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
                continue
            names.add(name)
    return names


def _audit(obj):
    w = obj.whoami()
    assert w["class_name"] == type(obj).__name__
    dumped = set(w["params"].keys()) | set(w.keys())
    missing = _constructor_args(type(obj)) - dumped
    assert not missing, (f"{type(obj).__name__}.whoami() omits "
                        f"constructor args: {sorted(missing)}")


@pytest.mark.parametrize("make", [
    lambda: OriginalDataLoader("p", "f"),
    lambda: PairsDataLoader("p", "f", {0: "a"}),
    lambda: TemporalCoherenceDataLoader("p", "f"),
    lambda: FramesDataLoader("p", "f"),
    lambda: MultiTaskDataLoader("p", "f", fid2spk_file="s"),
    lambda: MultimodalDataLoader("p", ["f1", "f2"]),
    lambda: OnDeviceSamplerDataLoader("f", std_file="c"),
], ids=["original", "pairs", "tcl", "frames", "multitask", "multimodal",
        "ondevice"])
def test_dataloader_whoami_complete(make):
    _audit(make())


@pytest.mark.parametrize("make", [
    lambda: DummySampler(),
    lambda: SamplerPairs(),
    lambda: SamplerCluster(std_file="c"),
    lambda: SamplerClusterSiamese(std_file="c", spkid_file="s"),
], ids=["dummy", "pairs", "cluster", "cluster-siamese"])
def test_sampler_whoami_complete(make):
    _audit(make())


@pytest.mark.parametrize("trainer_cls", [
    TrainerSiamese, TrainerSiameseMultitask, MultimodalTrainer])
def test_trainer_whoami_complete(tmp_path, trainer_cls):
    net = SiameseNetwork(input_dim=4, num_hidden_layers=1, hidden_dim=4,
                         output_dim=2, activation_layer="sigmoid",
                         output_path=str(tmp_path / "net"))
    trainer = trainer_cls(network=net, loss=coscos2(),
                          dataloader=OriginalDataLoader("p", "f"),
                          log_dir=str(tmp_path))
    _audit(trainer)
    # the nested dumps are complete too
    assert trainer.whoami()["dataloader"]["params"]["pairs_path"] == "p"
    assert trainer.whoami()["feature_generator"] is None


def test_ondevice_whoami_lists_round3_omissions():
    """The exact five params the round-3 review flagged as missing."""
    dl = OnDeviceSamplerDataLoader(
        "f", max_size_cluster=7, max_num_clusters=3,
        split_method="clusters", ratio_train_dev=0.6, pairs_path=None)
    p = dl.whoami()["params"]
    assert p["max_size_cluster"] == 7
    assert p["max_num_clusters"] == 3
    assert p["split_method"] == "clusters"
    assert p["ratio_train_dev"] == 0.6
    assert p["pairs_path"] is None
