from ultra_tpu.parallel.mesh import make_mesh, graph_pspec, MeshAxes
from ultra_tpu.parallel.dp import make_sharded_train_step
