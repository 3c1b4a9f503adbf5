"""Engine extension operators: dedup, similarity, text, multimodal, as-of."""
