#!/usr/bin/env python3
"""Setup for abnet3_tpu: TPU-native siamese speech-embedding framework.

Console scripts mirror the reference's entry points
(reference setup.py:45-49).
"""

from setuptools import find_packages, setup

setup(
    name="abnet3_tpu",
    version="0.1.0",
    description=("TPU-native (JAX/XLA/Pallas) siamese network framework for "
                 "unsupervised speech subword modeling"),
    packages=find_packages(exclude=["tests"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "optax",
        "numpy",
        "scipy",
        "h5py",
        "pyyaml",
    ],
    entry_points={
        "console_scripts": [
            "abnet3-gridsearch = abnet3_tpu.gridsearch:main",
            "abnet3-embed = abnet3_tpu.tools.embed_cli:main",
            "abnet3-features = abnet3_tpu.features:main",
            "abnet3-abx = abnet3_tpu.eval.abx:main",
        ],
    },
)
