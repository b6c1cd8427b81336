"""Round-based micro-batch orchestration + Structured Streaming operators."""
