"""ifseg_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
IFSeg (alinlab/ifseg, CVPR 2023): image-free semantic segmentation via the SegOFA
vision-language encoder-decoder.

Built from scratch for TPU hardware: bf16 MXU compute, single-controller JAX over a
device mesh (data/tensor parallel via jax.sharding + shard_map), static-shape
compiled train/eval steps, Pallas kernels for hot ops, and a numpy data pipeline
with mmseg-compatible augmentation semantics.

Layer map (mirrors SURVEY.md §1 capability surface):
  cli/        train & eval entry points (flag-compatible with the reference scripts)
  train/      trainer, criterion, optimizer/schedules, metrics, checkpointing, EMA
  models/     SegOFA encoder-decoder (ResNet stem, OFA transformer, surrogate decoder)
  data/       TSV datasets, augmentations, artificial-grid synthesis, batching
  ops/        resize/histogram/label-prop/CRF + Pallas attention kernels
  parallel/   mesh + sharding rules (dp/fsdp/tp)
  tokenization/  GPT-2 byte-level BPE + fairseq-compatible dictionary
  checkpoint/ torch ofa_*.pt -> JAX pytree translation (vocab surgery) + orbax manager
  generate/   beam-search sequence generation + search strategies
  eval/       native-resolution mIoU evaluation under static shape buckets
  benchmark/  synthetic tasks for zero-IO throughput measurement
  utils/      metrics/meters, progress sinks, profiling, reliability, scoring
"""

__version__ = "0.1.0"
