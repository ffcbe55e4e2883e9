from ultra_tpu.ops.rspmm import generalized_rspmm, rspmm_from_graph, degree, spmm_max
from ultra_tpu.ops import variadic
