"""wav2letter_tpu — a TPU-native end-to-end speech recognition framework.

A from-scratch reimplementation of the capabilities of wav2letter++/flashlight
(reference: /root/reference) designed for TPU: JAX/XLA for the compute graph,
Pallas for hot kernels (log-mel frontend, CTC/ASG alpha-beta trellises), pjit +
jax.sharding over device meshes for distribution, and a functional, static-shape
data pipeline.

Layout conventions (TPU-first, differs from the reference's ArrayFire T×C×1×B):
  - audio:      (B, S)        float32 samples
  - features:   (B, T, C)     frames-major, channels-last
  - emissions:  (B, T, N)     N = number of tokens (vocab)
  - targets:    (B, U) int32, padded with -1

Subpackages:
  data        .lst lists, dictionaries, lexicons, bucketing, prefetch
  features    MFSC/MFCC/raw frontend, SpecAugment
  models      .arch DSL → flax modules; all reference layer types
  criterions  CTC, ASG (+transitions/replabels), Seq2Seq, CPC
  ops         functional kernels (scan- and Pallas-based) used by criterions
  optim       optimizers + LR schedules (reference flag-compatible)
  runtime     Train/Test/Decode executors, checkpoints, meters, logging
  parallel    mesh construction and sharding rules
  decoder     lexicon/lexicon-free beam search, n-gram LM (ARPA/binary), trie
  inference   chunked streaming executor + checkpoint converter
"""

__version__ = "0.1.0"
