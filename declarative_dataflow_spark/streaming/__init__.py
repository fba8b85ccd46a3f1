"""Streaming: reactive epochs, incremental maintenance (DeltaJoin,
IncrementalAggregate, IncrementalRecursion), LWW + CAS state,
windows, diff sinks, streaming curation (quality/PII stage,
cross-batch near-dedup), and differentially-maintained corpus
statistics (duplicate-ngram fractions, vocabulary, retroactive
decontamination)."""
