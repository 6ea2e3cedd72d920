"""Structured-Streaming layer: micro-batch runners mirroring the
reference's execution semantics, plus streaming query registrations."""
