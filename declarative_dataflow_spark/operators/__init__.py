"""Beyond-reference operator library: dedup, similarity/ANN
(quantized search, semantic dedup groups), text analysis, corpus
curation (contamination, duplicate-ngram, shuffles, token budgets,
top-k per domain, vocab induction), sampling, packing, graph
analytics, multimodal (native PPM/BMP decode, PCM audio features),
bitemporal, WCO."""
