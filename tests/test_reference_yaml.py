"""Anchor the YAML schema to the reference's SHIPPED configs.

The reference's own test suite asserts the exact parsed dict of
empty.yaml and its 5-experiment grid expansion (reference
test/test_gridsearch.py:11-50); buckeye.yaml (reference
test/data/buckeye.yaml) is the canonical full 7-stage config with
grid_params + test_files. Parsing and instantiating those files —
unmodified, straight from the reference tree — is the strongest cheap
proof the schema is drop-in compatible. Expected literals are inlined
from the reference's asserted values, not recomputed.
"""

import copy
import os

import pytest
import yaml

from abnet3_tpu.gridsearch import GridSearch

REF_DATA = "/root/reference/test/data"
EMPTY_YAML = os.path.join(REF_DATA, "empty.yaml")
BUCKEYE_YAML = os.path.join(REF_DATA, "buckeye.yaml")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference checkout not present")


def test_parse_empty_yaml_exact_dict():
    """Byte-for-byte the dict the reference's test asserts
    (reference test/test_gridsearch.py:17-37)."""
    grid = GridSearch(input_file=EMPTY_YAML)
    grid.parse_yaml_input_file()
    assert grid.params == {
        "default_params": {
            "pathname_experience": "/empty_path",
            "features": {
                "class": "FeaturesGenerator",
                "arguments": {"run": "once"},
            },
            "sampler": {"class": "SamplerClusterSiamese"},
        },
        "grid_params": {
            "sampler": {
                "arguments": {
                    "type_sampling_mode": ["1", "log", "fcube", "f", "f2"],
                }
            }
        },
    }


def test_empty_yaml_grid_expansion():
    """5 experiments, swept values in file order (reference
    test/test_gridsearch.py:39-50 asserts the count and the first two)."""
    grid = GridSearch(input_file=EMPTY_YAML, date="D")
    exps = grid.build_grid_experiments()
    assert len(exps) == 5
    values = [e["sampler"]["arguments"]["type_sampling_mode"]
              for e in exps]
    assert values == ["1", "log", "fcube", "f", "f2"]
    for e in exps:
        assert e["pathname_experience"].startswith("/empty_path")
        assert e["features"] == {"class": "FeaturesGenerator",
                                 "arguments": {"run": "once"}}


def _buckeye_experiments(tmp_path):
    """buckeye.yaml rewritten only where it must be: experiment dir into
    tmp, run modes to 'never' (the shipped absolute /scratch2 data paths
    do not exist here). Every argument NAME stays as shipped."""
    with open(BUCKEYE_YAML) as f:
        params = yaml.safe_load(f)
    params["default_params"]["pathname_experience"] = str(tmp_path / "exp")
    params["default_params"]["sampler"]["arguments"]["run"] = "never"
    redirected = tmp_path / "buckeye.yaml"
    with open(redirected, "w") as f:
        yaml.dump(params, f)
    grid = GridSearch(input_file=str(redirected), date="D")
    return grid, grid.build_grid_experiments()


def test_buckeye_yaml_all_stages_instantiate(tmp_path):
    """Every stage block of the canonical config instantiates — every
    shipped argument name resolves on our classes — for the default
    params and all 5 grid expansions."""
    from abnet3_tpu.dataloader import OriginalDataLoader
    from abnet3_tpu.embedder import EmbedderSiamese
    from abnet3_tpu.features import FeaturesGenerator
    from abnet3_tpu.loss import coscos2
    from abnet3_tpu.models import SiameseNetwork
    from abnet3_tpu.sampler import SamplerClusterSiamese
    from abnet3_tpu.trainer import TrainerSiamese

    grid, exps = _buckeye_experiments(tmp_path)
    assert len(exps) == 5  # grid_params sweep: log fcube f f2 1
    swept = [e["sampler"]["arguments"]["type_sampling_mode"]
             for e in exps]
    assert swept == ["log", "fcube", "f", "f2", "1"]

    for exp in exps:
        (features, sampler, model, loss, dataloader, trainer,
         embedder) = grid._instantiate(copy.deepcopy(exp))
        assert isinstance(features, FeaturesGenerator)
        assert isinstance(sampler, SamplerClusterSiamese)
        assert isinstance(model, SiameseNetwork)
        assert isinstance(loss, coscos2)
        assert isinstance(dataloader, OriginalDataLoader)
        assert isinstance(trainer, TrainerSiamese)
        assert isinstance(embedder, EmbedderSiamese)

    # shipped argument values landed (spot checks on the last exp's set)
    assert features.run == "never" and features.n_filters == 40
    assert features.nframes == 7 and features.stack is True
    assert sampler.max_size_cluster == 20
    assert sampler.num_total_sampled_pairs == 500000
    assert sampler.spk_sampling_mode == "1"  # YAML int 1 -> mode name
    assert sampler.type_sampling_mode == "1"
    assert model.input_dim == 280 and model.hidden_dim == 500
    assert model.output_dim == 100 and model.num_hidden_layers == 2
    assert model.activation_layer == "sigmoid"
    assert loss.avg is False
    assert dataloader.num_max_minibatches == 10000
    assert dataloader.batch_size == 8
    # auto-wiring: dataloader consumes the sampler's pair dir + the
    # feature generator's output (reference gridsearch.py:172-186)
    assert dataloader.pairs_path == sampler.directory_output
    assert dataloader.features_path == features.output_path
    assert trainer.num_epochs == 200 and trainer.patience == 30
    assert trainer.optimizer_type == "adadelta" and trainer.lr == 0.1
    assert embedder.feature_path == features.output_path
    assert embedder.network_path == model.output_path + ".pth"


def test_buckeye_test_files_block(tmp_path):
    """The shipped test_files block parses into the held-out embedding
    list (reference gridsearch.py:234-277 consumes it)."""
    grid, _ = _buckeye_experiments(tmp_path)
    assert len(grid.test_files) == 1
    tf = grid.test_files[0]
    assert tf["name"] == "1Os.h5f"
    assert tf["files"] == "path/to/wav/directory"
    assert tf["features"] == "path/to/features.h5f"
