"""Distributed operators: extraction kernels, skew-aware repartitioning,
dedup family, similarity search, text statistics, multimodal plumbing."""
