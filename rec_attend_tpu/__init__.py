"""rec_attend_tpu: a TPU-native JAX/XLA/Pallas framework for end-to-end
recurrent-attention instance segmentation.

A from-scratch rebuild of the capability set of renmengye/rec-attend-public
(Ren & Zemel, "End-to-End Instance Segmentation with Recurrent Attention",
CVPR 2017), designed TPU-first:

- the T-step decode loop is a single ``jax.lax.scan`` (constant compile size,
  remat-friendly) instead of an unrolled graph;
- glimpse crop / mask paste are batched einsum contractions on the MXU (with
  fused Pallas kernels for the hot path) instead of per-channel matmul loops;
- Hungarian matching runs in-graph as a batched ``lax.while_loop`` solver
  (with a C++ host twin for bit-parity testing) instead of a CPU custom op;
- data parallelism / model sharding ride ``jax.sharding.Mesh`` + XLA
  collectives instead of a single-device session.

Layer map (mirrors reference layers L0-L9, see SURVEY.md):
  ops/       numerics core: losses, attention geometry, boxes, matching,
             augmentation, Pallas kernels        (ref modellib.py, image_ops.py)
  nn/        layer library: conv/dcnn/mlp/lstm/batchnorm as pure functions
             over named param pytrees            (ref nnlib.py)
  models/    full / box / fg model definitions   (ref {full,box,fg}_model.py)
  data/      datasets, assemblers, iterators     (ref data_api/)
  engine/    runners, experiments, checkpointing (ref runner.py, experiment.py)
  parallel/  mesh construction, sharded train steps (new; absent in reference)
  utils/     logging, time-series, postprocess, plotting (ref utils/)
  analysis   streaming metric analyzers          (ref analysis.py)
"""

__version__ = "0.1.0"
