"""ultra_tpu — a TPU-native (JAX/XLA/Pallas) framework for relational-graph
foundation models, with the capabilities of DeepGraphLearning/ULTRA.

Top-level layout:
  graph      — static-shape Graph pytrees
  ops        — rspmm kernels (XLA + Pallas), segment/variadic ops, edge matching
  models     — GeneralizedRelationalConv, RelNBFNet / EntityNBFNet / QueryNBFNet, Ultra
  tasks      — negative sampling, ranking, relation-graph construction
  data       — dataset zoo (KG + logical-query datasets)
  train      — jitted train/eval loops, losses, checkpointing
  parallel   — device-mesh sharding (data parallel + edge-partitioned rspmm)
  utils      — config system, torch-checkpoint conversion, logging
"""

from ultra_tpu.graph import Graph, make_graph

__version__ = "0.1.0"
