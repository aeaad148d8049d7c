"""CLI smoke tests: the three console entry points end-to-end."""

import os
import sys

import numpy as np
import pytest

from abnet3_tpu.io import read_h5features, write_h5features


@pytest.fixture
def experiment_yaml(tmp_path):
    rng = np.random.RandomState(0)
    feats_path = str(tmp_path / "feats.h5f")
    items = [f"f{i}" for i in range(3)]
    feats = [rng.randn(60, 4).astype(np.float32) for _ in items]
    times = [np.arange(60) * 0.01 + 0.0025 for _ in items]
    write_h5features(feats_path, "features", items, times, feats)

    pairs_path = str(tmp_path / "pairs")
    os.makedirs(os.path.join(pairs_path, "train_pairs"))
    os.makedirs(os.path.join(pairs_path, "dev_pairs"))
    with open(os.path.join(pairs_path, "train_pairs/dataset"), "w") as f:
        f.write("f0 0.00 0.12 f1 0.30 0.39 same\n"
                "f2 0.30 0.50 f0 0.10 0.18 diff\n")
    with open(os.path.join(pairs_path, "dev_pairs/dataset"), "w") as f:
        f.write("f0 0.20 0.30 f2 0.40 0.52 same\n")

    exp_path = str(tmp_path / "exp")
    yaml_path = str(tmp_path / "exp.yaml")
    with open(yaml_path, "w") as f:
        f.write(f"""
default_params:
  pathname_experience: {exp_path}
  features:
    class: FeaturesGenerator
    arguments: {{run: never, output_path: {feats_path}, method: fbanks,
                 normalization: false, norm_per_file: false, stack: false}}
  sampler: {{class: DummySampler, arguments: {{}}}}
  dataloader:
    class: OriginalDataLoader
    arguments: {{pairs_path: {pairs_path}, batch_size: 2,
                 num_max_minibatches: 1, seed: 0}}
  model:
    class: SiameseNetwork
    arguments: {{input_dim: 4, num_hidden_layers: 1, hidden_dim: 8,
                 output_dim: 5, p_dropout: 0.0,
                 activation_layer: sigmoid}}
  loss: {{class: coscos2, arguments: {{avg: true}}}}
  trainer:
    class: TrainerSiamese
    arguments: {{optimizer_type: adam, lr: 0.01, num_epochs: 1,
                 patience: 2, seed: 0}}
  embedder: {{class: EmbedderSiamese, arguments: {{batch_size: 64}}}}
""")
    return yaml_path, exp_path, feats_path


def test_gridsearch_cli_main(experiment_yaml, monkeypatch):
    from abnet3_tpu.gridsearch import main
    yaml_path, exp_path, _ = experiment_yaml
    monkeypatch.setattr(sys, "argv", ["abnet3-gridsearch", yaml_path])
    main()
    assert os.path.exists(os.path.join(exp_path, "embeddings.h5f"))


def test_embed_cli_main(experiment_yaml, monkeypatch, tmp_path):
    from abnet3_tpu.gridsearch import main as gs_main
    from abnet3_tpu.tools.embed_cli import main as embed_main
    yaml_path, exp_path, feats_path = experiment_yaml
    monkeypatch.setattr(sys, "argv", ["abnet3-gridsearch", yaml_path])
    gs_main()
    out = str(tmp_path / "reembed.h5f")
    monkeypatch.setattr(sys, "argv", [
        "abnet3-embed", yaml_path, "-w",
        os.path.join(exp_path, "network.pth"), "-i", feats_path,
        "-o", out])
    embed_main()
    data = read_h5features(out)
    assert data.features()[0].shape == (60, 5)


def test_embed_cli_generates_missing_features(experiment_yaml, monkeypatch,
                                              tmp_path):
    """No -i and no existing features file: the CLI generates the
    experiment's default features before embedding
    (reference tools/embed_cli.py:60-70)."""
    from scipy.io import wavfile
    from abnet3_tpu.gridsearch import main as gs_main
    from abnet3_tpu.tools.embed_cli import main as embed_main
    yaml_path, exp_path, feats_path = experiment_yaml
    monkeypatch.setattr(sys, "argv", ["abnet3-gridsearch", yaml_path])
    gs_main()  # trains network.pth

    wavdir = tmp_path / "cliwavs"
    wavdir.mkdir()
    fs = 16000
    rng = np.random.RandomState(0)
    for i in range(2):
        wavfile.write(str(wavdir / f"w{i}.wav"), fs,
                      (rng.randn(fs // 2) * 1000).astype(np.int16))
    gen_feats = str(tmp_path / "generated.h5f")  # does not exist yet
    with open(yaml_path) as f:
        text = f.read()
    text = text.replace(
        f"run: never, output_path: {feats_path}",
        f"run: once, files: {wavdir}, n_filters: 4, "
        f"output_path: {gen_feats}")
    gen_yaml = str(tmp_path / "gen.yaml")
    with open(gen_yaml, "w") as f:
        f.write(text)
    out = str(tmp_path / "gen_emb.h5f")
    monkeypatch.setattr(sys, "argv", [
        "abnet3-embed", gen_yaml, "-w",
        os.path.join(exp_path, "network.pth"), "-o", out])
    embed_main()
    assert os.path.exists(gen_feats)  # generated on demand
    data = read_h5features(out)
    assert data.items() == ["w0", "w1"]
    assert data.features()[0].shape[1] == 5


def test_features_cli_main(tmp_path, monkeypatch):
    from scipy.io import wavfile
    from abnet3_tpu.features import main as feats_main
    wavdir = tmp_path / "wavs"
    wavdir.mkdir()
    fs = 16000
    rng = np.random.RandomState(0)
    for i in range(2):
        wavfile.write(str(wavdir / f"u{i}.wav"), fs,
                      (rng.randn(fs // 2) * 1000).astype(np.int16))
    out = str(tmp_path / "out.h5f")
    monkeypatch.setattr(sys, "argv", [
        "abnet3-features", "wav", str(wavdir), out, "fbanks", "-n",
        "--norm-per-channel", "--stack"])
    feats_main()
    data = read_h5features(out)
    assert data.items() == ["u0", "u1"]
    assert data.features()[0].shape[1] == 280


def test_gridsearch_cli_bad_yaml(tmp_path, monkeypatch):
    from abnet3_tpu.gridsearch import main
    bad = tmp_path / "bad.yaml"
    bad.write_text("not_default_params: {}\n")
    monkeypatch.setattr(sys, "argv", ["abnet3-gridsearch", str(bad)])
    with pytest.raises(KeyError):
        main()


def test_embed_cli_honors_yaml_output_path(experiment_yaml, monkeypatch,
                                           tmp_path):
    """Without -o, the embed CLI must honor a YAML-configured embedder
    output_path like GridSearch does (review finding: it silently
    clobbered it with exp_path/embeddings.h5f)."""
    import yaml as _yaml
    from abnet3_tpu.gridsearch import main as gs_main
    from abnet3_tpu.tools.embed_cli import main as embed_main
    yaml_path, exp_path, feats_path = experiment_yaml
    monkeypatch.setattr(sys, "argv", ["abnet3-gridsearch", yaml_path])
    gs_main()  # trains network.pth
    custom = str(tmp_path / "custom_out.h5f")
    cfg = _yaml.safe_load(open(yaml_path))
    cfg["default_params"]["embedder"]["arguments"]["output_path"] = custom
    yml2 = str(tmp_path / "exp2.yaml")
    _yaml.dump(cfg, open(yml2, "w"))
    monkeypatch.setattr(sys, "argv", ["abnet3-embed", yml2])
    embed_main()
    data = read_h5features(custom)
    assert data.features()[0].shape == (60, 5)
