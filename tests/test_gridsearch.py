"""Gridsearch tests: YAML parsing, grid expansion, full-pipeline run."""

import os

import numpy as np
import pytest
import yaml

from abnet3_tpu.gridsearch import GridSearch

BASE_YAML = """\
default_params:
  pathname_experience: {exp_path}
  features:
    class: FeaturesGenerator
    arguments:
      run: never
      output_path: {feats_path}
      method: fbanks
      normalization: false
      norm_per_file: false
      stack: false
  sampler:
    class: DummySampler
    arguments: {{}}
  dataloader:
    class: OriginalDataLoader
    arguments:
      pairs_path: {pairs_path}
      batch_size: 3
      num_max_minibatches: 2
      seed: 0
  model:
    class: SiameseNetwork
    arguments:
      input_dim: 4
      num_hidden_layers: 1
      hidden_dim: 8
      output_dim: 5
      p_dropout: 0.0
      activation_layer: sigmoid
      type_init: xavier_uni
  loss:
    class: coscos2
    arguments:
      avg: true
  trainer:
    class: TrainerSiamese
    arguments:
      optimizer_type: adam
      lr: 0.01
      num_epochs: 2
      patience: 5
      seed: 0
  embedder:
    class: EmbedderSiamese
    arguments:
      batch_size: 64
"""

GRID_BLOCK = """\
grid_params:
  trainer:
    arguments:
      lr: [0.1, 0.01, 0.001]
"""


@pytest.fixture
def experiment(tmp_path):
    # reuse the dataloader corpus builders
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_dataloader import corpus as corpus_fixture  # noqa
    # build the corpus inline (can't call fixture directly)
    rng = np.random.RandomState(0)
    from abnet3_tpu.io import write_h5features
    d = 4
    feats_path = str(tmp_path / "feats.h5f")
    items = [f"f{i}" for i in range(4)]
    feats = [rng.randn(80, d).astype(np.float32) for _ in items]
    times = [np.arange(80) * 0.01 + 0.0025 for _ in items]
    write_h5features(feats_path, "features", items, times, feats)

    def tok(i, a, b):
        return f"f{i} {a:.2f} {b:.2f}"

    train_lines = [
        f"{tok(0, 0.0, 0.12)} {tok(1, 0.3, 0.39)} same",
        f"{tok(1, 0.0, 0.2)} {tok(2, 0.1, 0.25)} same",
        f"{tok(2, 0.3, 0.5)} {tok(3, 0.0, 0.08)} diff",
        f"{tok(0, 0.4, 0.55)} {tok(3, 0.2, 0.42)} diff",
    ]
    dev_lines = [
        f"{tok(0, 0.1, 0.2)} {tok(2, 0.4, 0.52)} same",
        f"{tok(1, 0.6, 0.7)} {tok(3, 0.6, 0.72)} diff",
    ]
    pairs_path = str(tmp_path / "pairs")
    os.makedirs(os.path.join(pairs_path, "train_pairs"))
    os.makedirs(os.path.join(pairs_path, "dev_pairs"))
    with open(os.path.join(pairs_path, "train_pairs/dataset"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(os.path.join(pairs_path, "dev_pairs/dataset"), "w") as f:
        f.write("\n".join(dev_lines) + "\n")

    exp_path = str(tmp_path / "exp")
    yaml_text = BASE_YAML.format(exp_path=exp_path, feats_path=feats_path,
                                 pairs_path=pairs_path)
    yaml_path = str(tmp_path / "exp.yaml")
    with open(yaml_path, "w") as f:
        f.write(yaml_text)
    return yaml_path, exp_path, yaml_text


def test_parse_yaml(experiment):
    yaml_path, exp_path, _ = experiment
    grid = GridSearch(input_file=yaml_path)
    grid.parse_yaml_input_file()
    assert grid.params["default_params"]["model"]["class"] \
        == "SiameseNetwork"
    assert grid.params["default_params"]["trainer"]["arguments"]["lr"] \
        == 0.01


def test_grid_expansion(experiment, tmp_path):
    yaml_path, exp_path, yaml_text = experiment
    grid_yaml = str(tmp_path / "grid.yaml")
    with open(grid_yaml, "w") as f:
        f.write(yaml_text + GRID_BLOCK)
    grid = GridSearch(input_file=grid_yaml, date="2026-01-01")
    exps = grid.build_grid_experiments()
    assert len(exps) == 3
    lrs = [e["trainer"]["arguments"]["lr"] for e in exps]
    assert lrs == [0.1, 0.01, 0.001]
    # swept experiments get distinct pathnames
    paths = [e["pathname_experience"] for e in exps]
    assert len(set(paths)) == 3
    assert all("2026-01-01" in p for p in paths)
    # default params unchanged for other entries
    assert all(e["model"]["arguments"]["hidden_dim"] == 8 for e in exps)


def test_no_grid_returns_default(experiment):
    yaml_path, _, _ = experiment
    grid = GridSearch(input_file=yaml_path)
    exps = grid.build_grid_experiments()
    assert len(exps) == 1


def test_run_single_experiment_end_to_end(experiment):
    """Full pipeline through the orchestrator: train + embed."""
    yaml_path, exp_path, _ = experiment
    grid = GridSearch(input_file=yaml_path)
    grid.run()
    # artifacts
    assert os.path.exists(os.path.join(exp_path, "exp.yml"))
    assert os.path.exists(os.path.join(exp_path, "network.pth"))
    assert os.path.exists(os.path.join(exp_path, "network.params"))
    assert os.path.exists(os.path.join(exp_path, "embeddings.h5f"))
    from abnet3_tpu.io import read_h5features
    emb = read_h5features(os.path.join(exp_path, "embeddings.h5f"))
    assert emb.items() == [f"f{i}" for i in range(4)]
    assert emb.features()[0].shape == (80, 5)


def test_test_files_embedding(experiment, tmp_path):
    """Held-out test corpora get feature-generated and embedded
    (reference gridsearch.py:234-277)."""
    import numpy as np
    from scipy.io import wavfile
    yaml_path, exp_path, yaml_text = experiment
    wavdir = tmp_path / "testwavs"
    wavdir.mkdir()
    fs = 16000
    rng = np.random.RandomState(0)
    for i in range(2):
        wavfile.write(str(wavdir / f"t{i}.wav"), fs,
                      (rng.randn(fs // 2) * 1000).astype(np.int16))
    # the experiment model takes 4-dim inputs -> test features must too:
    # use 4 mel filters, no stacking
    test_yaml = yaml_text + f"""
test_files:
  heldout:
    name: heldout
    files: {wavdir}
"""
    test_yaml = test_yaml.replace("method: fbanks",
                                  "method: fbanks\n      n_filters: 4")
    grid_yaml = str(tmp_path / "grid_test.yaml")
    with open(grid_yaml, "w") as f:
        f.write(test_yaml)
    grid = GridSearch(input_file=grid_yaml)
    grid.run()
    # test features generated + embedded next to the experiment
    assert os.path.exists(os.path.join(exp_path, "test-heldout"))
    from abnet3_tpu.io import read_h5features
    emb = read_h5features(os.path.join(exp_path, "heldout"))
    assert emb.items() == ["t0", "t1"]
    assert emb.features()[0].shape[1] == 5  # model output dim


def test_run_experiment_worker():
    """The num_jobs process-pool worker function is importable and
    callable at module level (spawn requirement)."""
    from abnet3_tpu.gridsearch import _run_experiment_worker
    import multiprocessing as mp
    assert callable(_run_experiment_worker)
    # module-level (picklable for spawn)
    import abnet3_tpu.gridsearch as g
    assert getattr(g, "_run_experiment_worker") is _run_experiment_worker


def test_num_jobs_parallel_grid(experiment, tmp_path, monkeypatch):
    """A 2-point grid runs in 2 worker processes (the reference declared
    num_jobs but never implemented it, reference gridsearch.py:299-300)."""
    yaml_path, exp_path, yaml_text = experiment
    grid_yaml = str(tmp_path / "grid2.yaml")
    with open(grid_yaml, "w") as f:
        f.write(yaml_text + "grid_params:\n  trainer:\n    arguments:\n"
                            "      lr: [0.1, 0.01]\n")
    monkeypatch.setenv("ABNET3_WORKER_PLATFORM", "cpu")
    grid = GridSearch(input_file=grid_yaml, num_jobs=2, date="2026-01-02")
    grid.run()
    import glob
    embs = glob.glob(os.path.join(exp_path, "2026-01-02", "lr", "*",
                                  "embeddings.h5f"))
    assert len(embs) == 2


def test_softmax_kl_yaml_end_to_end(experiment, tmp_path):
    """The KLLoss-on-distributions recipe is configurable from YAML just
    like the reference allows (softmax activation, reference
    model.py:19-23, + KLLoss, reference loss.py:108-137)."""
    yaml_path, exp_path, yaml_text = experiment
    kl_yaml_text = yaml_text.replace(
        "activation_layer: sigmoid", "activation_layer: softmax").replace(
        "class: coscos2", "class: KLLoss").replace(
        "avg: true", "avg: true\n      margin: 1.0")
    assert "softmax" in kl_yaml_text and "KLLoss" in kl_yaml_text
    kl_yaml = str(tmp_path / "kl.yaml")
    with open(kl_yaml, "w") as f:
        f.write(kl_yaml_text)
    GridSearch(input_file=kl_yaml).run()
    from abnet3_tpu.io import read_h5features
    emb = read_h5features(os.path.join(exp_path, "embeddings.h5f"))
    feats = emb.features()[0]
    assert feats.shape == (80, 5)
    # embeddings really are distributions
    assert np.all(feats > 0)
    np.testing.assert_allclose(feats.sum(axis=1), 1.0, rtol=1e-4)


def test_embed_only(experiment):
    yaml_path, exp_path, _ = experiment
    GridSearch(input_file=yaml_path).run()  # train first
    emb_path = os.path.join(exp_path, "embeddings.h5f")
    os.remove(emb_path)
    grid = GridSearch(input_file=yaml_path, embed_only=True)
    grid.run()
    assert os.path.exists(emb_path)


def test_run_with_yaml_mesh(experiment, tmp_path):
    """Mesh dicts in the YAML shard training (data x model) and embedding
    over the virtual 8-device mesh through the orchestrator."""
    yaml_path, exp_path, yaml_text = experiment
    meshed = yaml_text.replace(
        "      patience: 5",
        "      patience: 5\n      mesh: {data: 4, model: 2}").replace(
        "      batch_size: 64",
        "      batch_size: 64\n      mesh: {data: 8}")
    assert "mesh" in meshed
    mesh_yaml = str(tmp_path / "mesh.yaml")
    with open(mesh_yaml, "w") as f:
        f.write(meshed)
    GridSearch(input_file=mesh_yaml).run()
    from abnet3_tpu.io import read_h5features
    emb = read_h5features(os.path.join(exp_path, "embeddings.h5f"))
    assert emb.features()[0].shape[1] == 5


MULTI_YAML = """\
default_params:
  pathname_experience: {exp_path}
  features:
    class: FeaturesGenerator
    arguments:
      run: never
      output_path: {feats_path}
      method: fbanks
      normalization: false
      norm_per_file: false
      stack: false
  sampler:
    class: DummySampler
    arguments: {{}}
  dataloader:
    class: MultiTaskDataLoader
    arguments:
      pairs_path: {pairs_path}
      fid2spk_file: {spk_path}
      batch_size: 3
      num_max_minibatches: 2
      seed: 0
  model:
    class: SiameseMultitaskNetwork
    arguments:
      input_dim: 4
      num_hidden_layers_shared: 1
      num_hidden_layers_spk: 0
      num_hidden_layers_phn: 0
      hidden_dim: 8
      output_dim: 5
      p_dropout: 0.0
      activation_layer: sigmoid
      type_init: xavier_uni
  loss:
    class: weighted_loss_multi
    arguments:
      weight: 0.4
      loss_spk:
        class: coscos2
        arguments:
          avg: true
      loss_phn:
        class: cosmargin
        arguments:
          margin: 0.4
  trainer:
    class: TrainerSiameseMultitask
    arguments:
      optimizer_type: adam
      lr: 0.01
      num_epochs: 2
      patience: 5
      seed: 0
  embedder:
    class: EmbedderSiameseMultitask
    arguments:
      batch_size: 64
"""


def test_multitask_yaml_end_to_end(experiment, tmp_path):
    """The multitask family configures end-to-end from YAML, including
    the nested weighted_loss_multi sub-losses (the reference's
    reflection could not build nested losses at all) — trains via the
    multitask matrix-loss path and writes .spk/.phn embeddings."""
    yaml_path, exp_path, _ = experiment
    import yaml as _yaml
    with open(yaml_path) as f:
        base = _yaml.safe_load(f)
    feats_path = base["default_params"]["features"]["arguments"][
        "output_path"]
    pairs_path = base["default_params"]["dataloader"]["arguments"][
        "pairs_path"]
    spk_path = str(tmp_path / "spk.txt")
    with open(spk_path, "w") as f:
        for i in range(4):
            f.write(f"f{i} spk{i % 2}\n")
    mexp = str(tmp_path / "mexp")
    myaml = str(tmp_path / "mexp.yaml")
    with open(myaml, "w") as f:
        f.write(MULTI_YAML.format(exp_path=mexp, feats_path=feats_path,
                                  pairs_path=pairs_path,
                                  spk_path=spk_path))
    grid = GridSearch(input_file=myaml, date="2026-01-01")
    grid.run()
    found = []
    for root, _, files in os.walk(mexp):
        found += [f for f in files if f.endswith((".spk", ".phn"))]
    assert any(f.endswith(".spk") for f in found), found
    assert any(f.endswith(".phn") for f in found), found


ONDEVICE_YAML = """\
default_params:
  pathname_experience: {exp_path}
  features:
    class: FeaturesGenerator
    arguments:
      run: never
      output_path: {feats_path}
      method: fbanks
      normalization: false
      norm_per_file: false
      stack: false
  sampler:
    class: DummySampler
    arguments: {{}}
  dataloader:
    class: OnDeviceSamplerDataLoader
    arguments:
      std_file: {classes_path}
      spkid_file: {spk_path}
      batch_size: 4
      num_max_minibatches: 2
      max_size_cluster: 10
      seed: 0
      steps_per_call: 2
  model:
    class: SiameseNetwork
    arguments:
      input_dim: 4
      num_hidden_layers: 1
      hidden_dim: 8
      output_dim: 5
      p_dropout: 0.0
      activation_layer: sigmoid
      type_init: xavier_uni
  loss:
    class: coscos2
    arguments:
      avg: true
  trainer:
    class: TrainerSiamese
    arguments:
      optimizer_type: adam
      lr: 0.01
      num_epochs: 2
      patience: 5
      seed: 0
  embedder:
    class: EmbedderSiamese
    arguments:
      batch_size: 64
"""


def test_ondevice_sampler_yaml_end_to_end(experiment, tmp_path):
    """The fully on-device pipeline (no pair files; the jitted step
    samples fresh pairs from compiled distribution tables) configures
    end-to-end from YAML with DummySampler."""
    yaml_path, exp_path, _ = experiment
    import yaml as _yaml
    with open(yaml_path) as f:
        base = _yaml.safe_load(f)
    feats_path = base["default_params"]["features"]["arguments"][
        "output_path"]
    classes_path = str(tmp_path / "words.classes")
    lines = []
    # stay inside the 80-frame (0.8 s) fixture files: tokens cycle
    # through per-file time slots
    slot = {i: 0.0 for i in range(4)}
    for c in range(3):
        lines.append(f"{c} word{c}")
        for k in range(3):
            f_i = (c + k) % 4
            t = slot[f_i]
            lines.append(f"f{f_i} {t:.2f} {t + 0.12:.2f}")
            slot[f_i] = t + 0.15
        lines.append("")
    with open(classes_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    spk_path = str(tmp_path / "spk2.txt")
    with open(spk_path, "w") as f:
        for i in range(4):
            f.write(f"f{i} spk{i % 2}\n")
    oexp = str(tmp_path / "oexp")
    oyaml = str(tmp_path / "oexp.yaml")
    with open(oyaml, "w") as f:
        f.write(ONDEVICE_YAML.format(exp_path=oexp,
                                     feats_path=feats_path,
                                     classes_path=classes_path,
                                     spk_path=spk_path))
    grid = GridSearch(input_file=oyaml, date="2026-01-01")
    grid.run()
    found = []
    for root, _, files in os.walk(oexp):
        found += [f for f in files if f.endswith(".h5f")
                  or f.endswith(".pth")]
    assert any(f.endswith(".pth") for f in found), found
    assert any(f.endswith(".h5f") for f in found), found


ABX_BLOCK = """\
  abx:
    run: always
    arguments:
      classes_path: {classes_path}
      spkid_file: {spk_path}
      task: across
      distance: dtw_cos
      batch_size: 64
"""


def test_abx_stage_yaml_end_to_end(experiment, tmp_path):
    """The optional abx YAML block scores the exported embeddings
    in-framework right after the embed stage (the reference defers
    scoring to external ABXpy) and writes abx.json."""
    import json
    yaml_path, exp_path, yaml_text = experiment
    classes_path = str(tmp_path / "w.classes")
    lines = []
    for ci in range(2):
        lines.append(f"{ci} word{ci}")
        for fi in range(4):
            t0 = 0.05 + 0.3 * ci
            lines.append(f"f{fi} {t0:.2f} {t0 + 0.12:.2f}")
        lines.append("")
    open(classes_path, "w").write("\n".join(lines) + "\n")
    spk_path = str(tmp_path / "spk.txt")
    open(spk_path, "w").write("f0 a\nf1 a\nf2 b\nf3 b\n")
    yaml2 = str(tmp_path / "exp_abx.yaml")
    open(yaml2, "w").write(
        yaml_text + ABX_BLOCK.format(classes_path=classes_path,
                                     spk_path=spk_path))
    # the 2-space indent nests the block under default_params
    grid = GridSearch(input_file=yaml2)
    exps = grid.build_grid_experiments()
    grid.run_single_experiment(single_experiment=exps[0])
    out = os.path.join(exps[0]["pathname_experience"], "abx.json")
    assert os.path.exists(out)
    result = json.loads(open(out).read())
    assert result["n_tokens"] == 8 and np.isfinite(result["error"])
    assert result["task"] == "across"


def test_rerun_overwrites_sampler_output(experiment):
    """Re-running an experiment (main() warns about overwriting and
    proceeds) must not crash on the sampler's existing pairs directory
    (review finding: sampler.sample() keeps the reference's bare
    os.makedirs parity, so gridsearch removes the stale directory)."""
    yaml_path, exp_path, _ = experiment
    GridSearch(input_file=yaml_path).run()
    # second run: previously FileExistsError from the sampler makedirs
    GridSearch(input_file=yaml_path).run()
    assert os.path.exists(os.path.join(exp_path, "network.pth"))


def test_empty_arguments_block_parses(experiment, tmp_path):
    """A YAML stage with a present-but-empty 'arguments:' block (valid
    YAML, parses to None) must instantiate with defaults instead of
    crashing dict(None) (review finding: only the loss stage had the
    'or {}' guard)."""
    import yaml as _yaml
    yaml_path, exp_path, _ = experiment
    with open(yaml_path) as fh:
        cfg = _yaml.safe_load(fh)
    cfg["default_params"]["features"]["arguments"] = None
    p2 = str(tmp_path / "empty_args.yaml")
    with open(p2, "w") as fh:
        _yaml.dump(cfg, fh)
    grid = GridSearch(input_file=p2)
    exps = grid.build_grid_experiments()
    features = grid._instantiate(exps[0])[0]
    assert features is not None
