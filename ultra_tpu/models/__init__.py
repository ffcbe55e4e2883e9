from ultra_tpu.models.layers import ConvConfig, conv_apply
from ultra_tpu.models.nbfnet import (
    NBFNetConfig,
    UltraConfig,
    bellmanford,
    entity_nbfnet_apply,
    entity_nbfnet_score_all,
    negative_sample_to_tail,
    query_nbfnet_apply,
    rel_nbfnet_apply,
    ultra_apply,
    ultra_score_all,
)
