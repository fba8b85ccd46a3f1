"""Sinks: AssocIn nested-document assembly (reference src/sinks)."""
