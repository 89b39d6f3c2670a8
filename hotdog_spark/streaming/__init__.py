"""Structured Streaming runtime: sources, sinks, runner, metrics.

The streaming dataflow is the same compiled rule cascade as batch —
Structured Streaming's unified model means ``plans.compiler`` output plugs
into ``readStream`` unchanged (the reference's daemon loop,
src/connection.rs:65-247, becomes source → cascade → writeStream)."""
