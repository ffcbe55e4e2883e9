from ultra_tpu.query import ops
from ultra_tpu.query.executor import (
    QueryConfig,
    execute,
    relation_projection,
    simulate_symbolic,
    graphs_for_slots,
)
