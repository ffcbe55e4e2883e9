from ultra_tpu.data.synthetic import synthetic_graph, random_kg_triples, with_inverses
