"""Beyond-reference operator library: dedup, similarity/ANN, text,
sampling, packing, graph analytics, multimodal, bitemporal, WCO."""
