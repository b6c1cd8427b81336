"""Pure-Python re-implementations of reference semantics — the test oracle."""
