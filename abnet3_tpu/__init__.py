"""ABnet3-TPU: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of bootphon/abnet3.

ABnet3 is a siamese-network framework for unsupervised speech subword
modeling (ZeroSpeech): it learns frame-level embeddings from same/different
word-pair side information using cosine-based contrastive losses over
DTW-aligned frame pairs.

This package keeps the reference's public surface (class names, YAML
gridsearch schema, pairs-file and h5features formats; see
/root/reference/abnet3/__init__.py and gridsearch.md) but the architecture is
TPU-first:

- batched anti-diagonal/row-scan DTW alignment runs **on device** inside the
  jitted train step (the reference calls Cython DTW per pair on the host,
  reference dataloader.py:189),
- models are pure-functional pytrees with a single fused siamese forward
  (both towers share one matmul pass on the MXU),
- training state is device-resident and updated by one jitted step,
- scaling is expressed with jax.sharding.Mesh + NamedSharding instead of
  .cuda() device pushes (reference trainer.py:218-221).
"""

__version__ = "0.1.0"

# Submodules are imported lazily by users (mirrors the reference package,
# which has no re-exports: reference abnet3/__init__.py:1-3).
