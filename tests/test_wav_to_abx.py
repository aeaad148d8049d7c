"""Full-contract integration test: raw WAV FILES -> abx.json on CPU.

The TPU demo (examples/wav_pipeline_demo.py) proves this chain on
hardware; this test locks the same one-YAML gridsearch contract into
the suite at toy scale (reference call stack SURVEY.md §3.1, fixture
idiom test/data/buckeye.yaml): wav dir -> FeaturesGenerator (fbanks +
CMVN + stacking, batched front end) -> SamplerClusterSiamese ->
OriginalDataLoader -> TrainerSiamese -> EmbedderSiamese -> in-framework
ABX -> abx.json, all instantiated by GridSearch reflection from one
YAML file.
"""

import json
import os

import numpy as np
import pytest

from abnet3_tpu.gridsearch import GridSearch

FS = 16000
N_CLASSES = 6
N_SPK = 2
TOKENS_PER_CLASS = 4

YAML_TEMPLATE = """\
default_params:
  pathname_experience: {exp_path}
  features:
    class: FeaturesGenerator
    arguments:
      run: once
      files: {wavdir}
      method: fbanks
      n_filters: 8
      normalization: true
      norm_per_file: false
      stack: true
      nframes: 7
  sampler:
    class: SamplerClusterSiamese
    arguments:
      run: once
      std_file: {classes_path}
      spkid_file: {spk_path}
      seed: 0
      type_sampling_mode: log
      spk_sampling_mode: log
      num_total_sampled_pairs: 800
  dataloader:
    class: OriginalDataLoader
    arguments:
      batch_size: 16
      num_max_minibatches: 4
      seed: 0
      align_backend: bank
      steps_per_call: 2
  model:
    class: SiameseNetwork
    arguments:
      input_dim: 56
      num_hidden_layers: 1
      hidden_dim: 32
      output_dim: 12
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
      batch_size: 256
  abx:
    run: always
    arguments:
      task: across
      distance: dtw_cos
"""


def _synth_corpus(wavdir, workdir, rng):
    """One wav per token: each class is a fixed two-sinusoid chord, each
    speaker scales the frequencies (the demo's formant idiom, shrunk)."""
    from scipy.io import wavfile

    class_freqs = [(rng.uniform(300, 800), rng.uniform(1000, 2400))
                   for _ in range(N_CLASSES)]
    spk_scale = [rng.uniform(0.9, 1.15) for _ in range(N_SPK)]

    os.makedirs(wavdir)
    classes_lines = []
    spk_of = {}
    tid = 0
    for c in range(N_CLASSES):
        classes_lines.append(f"{c} word{c}")
        for k in range(TOKENS_PER_CLASS):
            s = k % N_SPK  # every class spoken by every speaker
            f1, f2 = class_freqs[c]
            scale = spk_scale[s] * rng.uniform(0.98, 1.02)
            n = int(rng.uniform(0.25, 0.4) * FS)
            t = np.arange(n) / FS
            sig = (np.sin(2 * np.pi * f1 * scale * t)
                   + 0.7 * np.sin(2 * np.pi * f2 * scale * t))
            sig = sig * np.hanning(n) + rng.randn(n) * 0.01
            fname = f"tok{tid:03d}"
            wavfile.write(os.path.join(wavdir, fname + ".wav"), FS,
                          (sig * 8000).astype(np.int16))
            nf = 1 + (n - int(0.025 * FS)) // (FS // 100)
            classes_lines.append(f"{fname} 0.0025 "
                                 f"{(nf - 1) * 0.01 + 0.0025:.4f}")
            spk_of[fname] = f"spk{s}"
            tid += 1
        classes_lines.append("")

    classes_path = os.path.join(workdir, "words.classes")
    with open(classes_path, "w") as fh:
        fh.write("\n".join(classes_lines) + "\n")
    spk_path = os.path.join(workdir, "spk.txt")
    with open(spk_path, "w") as fh:
        for fname, spk in sorted(spk_of.items()):
            fh.write(f"{fname} {spk}\n")
    return classes_path, spk_path, tid


@pytest.mark.slow
def test_wav_to_abx_full_contract(tmp_path):
    rng = np.random.RandomState(7)
    wavdir = str(tmp_path / "wavs")
    classes_path, spk_path, n_tok = _synth_corpus(wavdir, str(tmp_path), rng)
    assert n_tok == N_CLASSES * TOKENS_PER_CLASS

    exp_path = str(tmp_path / "exp")
    yaml_path = str(tmp_path / "exp.yaml")
    with open(yaml_path, "w") as fh:
        fh.write(YAML_TEMPLATE.format(exp_path=exp_path, wavdir=wavdir,
                                      classes_path=classes_path,
                                      spk_path=spk_path))

    grid = GridSearch(input_file=yaml_path)
    exps = grid.build_grid_experiments()
    assert len(exps) == 1
    grid.run_single_experiment(single_experiment=exps[0])

    # every stage artifact the reference contract names (the gridsearch
    # auto-wires the features stage to <exp>/features, no extension)
    feats = os.path.join(exp_path, "features")
    assert os.path.exists(feats)
    for split in ("train_pairs", "dev_pairs"):
        p = os.path.join(exp_path, "pairs", split, "dataset")
        assert os.path.exists(p) and os.path.getsize(p) > 0
    assert os.path.exists(os.path.join(exp_path, "network.pth"))
    emb = os.path.join(exp_path, "embeddings.h5f")
    assert os.path.exists(emb)

    # the embeddings are the trained tower's output dim, for every frame
    from abnet3_tpu.io import read_h5features
    data = read_h5features(emb)
    assert len(data.items()) == n_tok
    assert all(f.shape[1] == 12 for f in data.features())

    out = os.path.join(exp_path, "abx.json")
    assert os.path.exists(out)
    result = json.loads(open(out).read())
    assert result["n_tokens"] == n_tok
    assert result["task"] == "across"
    assert 0.0 <= result["error"] <= 1.0 and np.isfinite(result["error"])
    assert result["n_triplets"] > 0
