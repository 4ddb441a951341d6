"""Sequential reference-semantics oracle (correctness ground truth)."""
