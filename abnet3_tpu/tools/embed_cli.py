#!/usr/bin/env python3
"""Standalone embedding CLI: re-embed arbitrary features with trained
weights (reference tools/embed_cli.py:25-193).

Usage: ``abnet3-embed experiment.yml -w weights.pth -i input.h5f -o out.h5f``
The YAML is a gridsearch experiment file; its model/embedder blocks define
the network architecture to load the weights into.
"""

from __future__ import annotations

import argparse
import faulthandler
import os

import yaml

import abnet3_tpu.embedder
import abnet3_tpu.features
import abnet3_tpu.model

faulthandler.enable()

__all__ = ["EmbedCLI", "main"]


class EmbedCLI:
    def __init__(self, yaml_file=None, weights=None, input_features=None,
                 output_embeddings=None):
        self.yaml_file = yaml_file
        self.weights = weights
        self.input_features = input_features
        self.output_embeddings = output_embeddings

    def parse_yaml_input_file(self):
        with open(self.yaml_file, "r") as stream:
            self.params = yaml.safe_load(stream)

    def run_embedding(self, single_experiment=None):
        if self.output_embeddings is None and \
                self.input_features is not None:
            raise ValueError("If you give a custom input, you have to "
                             "specify an output.")
        exp_path = single_experiment["pathname_experience"]

        model_prop = single_experiment["model"]
        model_class = getattr(abnet3_tpu.model, model_prop["class"])
        arguments = dict(model_prop.get("arguments") or {})
        arguments["output_path"] = os.path.join(exp_path, "network")
        model = model_class(**arguments)

        if self.weights is not None:
            network_path = self.weights
        else:
            network_path = model.output_path + ".pth"

        if self.input_features is not None:
            feature_path = self.input_features
        else:
            # no -i: resolve the experiment's default features and
            # GENERATE them if the file does not exist yet
            # (reference tools/embed_cli.py:60-70)
            features_prop = single_experiment["features"]
            arguments = dict(features_prop.get("arguments") or {})
            if "output_path" not in arguments:
                arguments["output_path"] = os.path.join(exp_path,
                                                        "features")
            feature_path = arguments["output_path"]
            if not os.path.exists(feature_path):
                features_class = getattr(abnet3_tpu.features,
                                         features_prop["class"])
                features_class(**arguments).generate()
            print("Using default features : %s" % feature_path)

        embedder_prop = single_experiment["embedder"]
        embedder_class = getattr(abnet3_tpu.embedder,
                                 embedder_prop["class"])
        arguments = dict(embedder_prop.get("arguments") or {})
        arguments["network"] = model
        arguments["network_path"] = network_path
        arguments["feature_path"] = feature_path
        if self.output_embeddings is not None:
            arguments["output_path"] = self.output_embeddings
        else:
            # honor a YAML-configured output_path like GridSearch does
            # (reference tools/embed_cli.py keeps the experiment's own
            # embedder config); only default when neither -o nor the
            # YAML names one
            arguments.setdefault("output_path",
                                 os.path.join(exp_path, "embeddings.h5f"))
        embedder_class(**arguments).embed()

    def run(self):
        self.parse_yaml_input_file()
        self.run_embedding(self.params["default_params"])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("exp_yml", type=str,
                        help="gridsearch yaml describing the experiment")
    parser.add_argument("-w", "--weights", type=str,
                        help="path to trained network weights (.pth)")
    parser.add_argument("-i", "--input-features", type=str,
                        help="input h5features file to embed")
    parser.add_argument("-o", "--output-embeddings", type=str,
                        help="output embeddings path")
    args = parser.parse_args()
    cli = EmbedCLI(yaml_file=args.exp_yml, weights=args.weights,
                   input_features=args.input_features,
                   output_embeddings=args.output_embeddings)
    cli.run()


if __name__ == "__main__":
    main()
