"""Import smoke tests (the reference's test_install.py analogue)."""

import importlib

import pytest

MODULES = [
    "abnet3_tpu",
    "abnet3_tpu.utils",
    "abnet3_tpu.io",
    "abnet3_tpu.io.h5f",
    "abnet3_tpu.nn",
    "abnet3_tpu.serialize",
    "abnet3_tpu.loss",
    "abnet3_tpu.model",
    "abnet3_tpu.models",
    "abnet3_tpu.models.siamese",
    "abnet3_tpu.models.multimodal",
    "abnet3_tpu.integration",
    "abnet3_tpu.features",
    "abnet3_tpu.sampler",
    "abnet3_tpu.dataloader",
    "abnet3_tpu.trainer",
    "abnet3_tpu.embedder",
    "abnet3_tpu.gridsearch",
    "abnet3_tpu.tools.embed_cli",
    "abnet3_tpu.ops",
    "abnet3_tpu.ops.dtw",
    "abnet3_tpu.ops.dsp",
    "abnet3_tpu.ops.bank",
    "abnet3_tpu.ops.pallas_dtw",
    "abnet3_tpu.parallel",
    "abnet3_tpu.parallel.mesh",
    "abnet3_tpu.native",
    "abnet3_tpu.profiling",
]


@pytest.mark.parametrize("module", MODULES)
def test_importable(module):
    importlib.import_module(module)


def test_public_api_surface():
    """The reference's public class names must all exist
    (BASELINE.json API contract)."""
    import abnet3_tpu.dataloader as D
    import abnet3_tpu.embedder as E
    import abnet3_tpu.features as F
    import abnet3_tpu.integration as I
    import abnet3_tpu.loss as L
    import abnet3_tpu.model as M
    import abnet3_tpu.sampler as S
    import abnet3_tpu.trainer as T

    for name in ("FeaturesGenerator",):
        assert hasattr(F, name)
    for name in ("SamplerBuilder", "DummySampler", "SamplerPairs",
                 "SamplerCluster", "SamplerClusterSiamese"):
        assert hasattr(S, name)
    for name in ("DataLoader", "OriginalDataLoader", "PairsDataLoader",
                 "TemporalCoherenceDataLoader", "FramesDataLoader",
                 "MultiTaskDataLoader", "MultimodalDataLoader"):
        assert hasattr(D, name)
    for name in ("NetworkBuilder", "SiameseNetwork",
                 "SiameseMultitaskNetwork", "MultimodalSiameseNetwork"):
        assert hasattr(M, name)
    for name in ("LossBuilder", "coscos2", "cosmargin", "KLLoss",
                 "weighted_loss_multi"):
        assert hasattr(L, name)
    for name in ("IntegrationUnitBuilder", "ConcatenationIntegration",
                 "SumIntegration", "MultitaskIntegration",
                 "BiWeightedFixed", "BiWeightedScalarLearnt",
                 "BiWeightedDeepLearnt", "BiWeightedPreTrained"):
        assert hasattr(I, name)
    for name in ("TrainerBuilder", "TrainerSiamese",
                 "TrainerSiameseMultitask", "MultimodalTrainer"):
        assert hasattr(T, name)
    for name in ("EmbedderBuilder", "EmbedderSiamese",
                 "EmbedderSiameseMultitask", "MultimodalEmbedder"):
        assert hasattr(E, name)


def test_console_scripts_declared():
    """setup.py declares the three reference console scripts
    (reference setup.py:45-49)."""
    import os
    setup_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "setup.py")
    text = open(setup_path).read()
    for script in ("abnet3-gridsearch", "abnet3-embed", "abnet3-features"):
        assert script in text
