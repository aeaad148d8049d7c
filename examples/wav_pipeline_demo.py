#!/usr/bin/env python3
"""Full-contract pipeline on one TPU chip, starting from WAV FILES.

The one stage examples/scale_demo.py skips is the acoustic front end;
this demo synthesizes a ~1.1k-token wav corpus (48 word classes x 8
"speakers": formant-trajectory words, per-speaker formant scaling +
spectral tilt + gain) and then drives the COMPLETE abnet3-gridsearch
contract from one YAML, exactly as a user would
(reference test/data/buckeye.yaml; call stack SURVEY.md §3.1):

    wav -> FeaturesGenerator (fbanks + CMVN + 7-frame stacking, the
    round-4 batched async front end) -> SamplerClusterSiamese ->
    OriginalDataLoader (bank backend, K=8 chained matrix-loss steps) ->
    TrainerSiamese -> EmbedderSiamese -> in-framework ABX -> abx.json

plus a raw-feature ABX on the same device evaluator for the
trained-vs-raw comparison. Prints per-stage wall times.

Usage: python examples/wav_pipeline_demo.py [workdir]
(expects a TPU backend; ~10 minutes through the dev tunnel, most of it
remote compile)
"""

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

FS = 16000
N_CLASSES = 48
N_SPK = 8
TOKENS_PER_CLASS = 24
N_SEGMENTS = 4  # formant segments per word class


def synth_word_corpus(wavdir, workdir, rng):
    """Synthesize one wav per token: each class is a fixed 4-segment
    (f1, f2) formant trajectory; each speaker scales formants, tilts
    the spectrum and changes gain; each token jitters duration and
    frequencies. Returns (classes_path, spk_path, n_tokens)."""
    from scipy.io import wavfile

    class_specs = [
        [(rng.uniform(250, 850), rng.uniform(1000, 2700))
         for _ in range(N_SEGMENTS)]
        for _ in range(N_CLASSES)]
    spk_specs = [
        {"scale": rng.uniform(0.85, 1.2), "tilt": rng.uniform(0.4, 2.2),
         "gain": rng.uniform(0.5, 1.4)}
        for _ in range(N_SPK)]

    os.makedirs(wavdir)
    classes_lines = []
    spk_of = {}
    tid = 0
    for c in range(N_CLASSES):
        classes_lines.append(f"{c} word{c}")
        for _ in range(TOKENS_PER_CLASS):
            s = rng.randint(N_SPK)
            spec, spk = class_specs[c], spk_specs[s]
            dur = rng.uniform(0.45, 0.75)
            n = int(dur * FS)
            seg_len = n // N_SEGMENTS
            f1 = np.concatenate([
                np.full(seg_len, a * spk["scale"] * rng.uniform(0.97, 1.03))
                for a, _ in spec])
            f2 = np.concatenate([
                np.full(seg_len, b * spk["scale"] * rng.uniform(0.97, 1.03))
                for _, b in spec])
            m = len(f1)
            # time-varying sinusoids need integrated phase
            sig = (np.sin(2 * np.pi * np.cumsum(f1) / FS)
                   + spk["tilt"] * np.sin(2 * np.pi * np.cumsum(f2) / FS))
            sig *= np.hanning(m) * spk["gain"]
            sig += rng.randn(m) * 0.02
            fname = f"tok{tid:05d}"
            wavfile.write(os.path.join(wavdir, fname + ".wav"), FS,
                          (sig * 6000).astype(np.int16))
            nf = 1 + (m - int(0.025 * FS)) // (FS // 100)
            t0, t1 = 0.0025, (nf - 1) * 0.01 + 0.0025
            classes_lines.append(f"{fname} {t0:.4f} {t1:.4f}")
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


YAML_TEMPLATE = """\
default_params:
  pathname_experience: {exp_path}
  features:
    class: FeaturesGenerator
    arguments:
      run: once
      files: {wavdir}
      method: fbanks
      n_filters: 40
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
      max_size_cluster: 24
      type_sampling_mode: log
      spk_sampling_mode: log
      num_total_sampled_pairs: 60000
  dataloader:
    class: OriginalDataLoader
    arguments:
      batch_size: 128
      num_max_minibatches: 32
      seed: 0
      align_backend: bank
      steps_per_call: 8
  model:
    class: SiameseNetwork
    arguments:
      input_dim: 280
      num_hidden_layers: 2
      hidden_dim: 500
      output_dim: 100
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
      lr: 0.001
      num_epochs: 25
      patience: 30
      seed: 0
  embedder:
    class: EmbedderSiamese
    arguments:
      batch_size: 4096
  abx:
    run: always
    arguments:
      task: across
      distance: dtw_cos
"""


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/abnet3_wav_pipe"
    if os.path.exists(workdir):
        shutil.rmtree(workdir)
    os.makedirs(workdir)
    rng = np.random.RandomState(0)
    stages = {}

    t0 = time.time()
    wavdir = os.path.join(workdir, "wavs")
    classes_path, spk_path, n_tok = synth_word_corpus(wavdir, workdir, rng)
    stages["wav synthesis (host)"] = time.time() - t0
    print(f"== synthesized {n_tok} token wavs "
          f"({N_CLASSES} classes, {N_SPK} speakers) ==", flush=True)

    exp_path = os.path.join(workdir, "exp")
    yaml_path = os.path.join(workdir, "exp.yaml")
    with open(yaml_path, "w") as fh:
        fh.write(YAML_TEMPLATE.format(exp_path=exp_path, wavdir=wavdir,
                                      classes_path=classes_path,
                                      spk_path=spk_path))

    # per-stage wall-clock: wrap the stage entry points the gridsearch
    # drives (the demo still runs the real GridSearch.run() contract)
    from abnet3_tpu.embedder import EmbedderSiamese
    from abnet3_tpu.features import FeaturesGenerator
    from abnet3_tpu.gridsearch import GridSearch
    from abnet3_tpu.sampler import SamplerClusterSiamese
    from abnet3_tpu.trainer import TrainerSiamese

    def timed(cls, meth, label):
        orig = getattr(cls, meth)

        def wrapper(self, *a, **k):
            t = time.time()
            out = orig(self, *a, **k)
            stages[label] = stages.get(label, 0.0) + time.time() - t
            return out
        setattr(cls, meth, wrapper)

    timed(FeaturesGenerator, "generate", "features (wav->fbank->CMVN->stack)")
    timed(SamplerClusterSiamese, "sample", "sampler (60k pairs)")
    timed(TrainerSiamese, "train", "training (25 epochs, bank K=8)")
    timed(EmbedderSiamese, "embed", "embedding export")
    timed(GridSearch, "_run_abx", "device ABX (trained, all pairs)")

    print("== gridsearch: features -> sample -> train -> embed -> abx ==",
          flush=True)
    GridSearch(input_file=yaml_path).run()

    with open(os.path.join(exp_path, "abx.json")) as fh:
        trained = json.load(fh)
    print(f"trained-embedding ABX: {trained['error']:.3f} over "
          f"{trained['n_triplets']} triplets", flush=True)

    print("== device ABX on the RAW stacked features ==", flush=True)
    t0 = time.time()
    from abnet3_tpu.eval import evaluate
    raw = evaluate(os.path.join(exp_path, "features"), classes_path,
                   spkid_file=spk_path, task="across", distance="dtw_cos")
    stages["device ABX (raw features)"] = time.time() - t0
    print(f"raw-feature ABX: {raw['error']:.3f} over "
          f"{raw['n_triplets']} triplets", flush=True)

    print("\n== stage wall times ==")
    for k, v in stages.items():
        print(f"  {k:36s} {v:7.1f}s")
    assert trained["error"] < raw["error"], \
        "training did not improve device ABX over raw features"
    print(f"OK: trained {trained['error']:.3f} < raw {raw['error']:.3f}")


if __name__ == "__main__":
    main()
