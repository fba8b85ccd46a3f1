"""Streaming: reactive epochs, incremental maintenance (DeltaJoin,
IncrementalAggregate, IncrementalRecursion), LWW state, windows,
diff sinks."""
