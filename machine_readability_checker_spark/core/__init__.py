"""Single-node vectorized core.

Pure pandas/numpy/stdlib implementations of every reference operator.  These
functions are the bodies of the Spark ``mapInPandas`` kernels AND the test
oracle — one implementation, two harnesses, so span equality between the
distributed and single-node paths is equality against itself plus
partition-invariance (SURVEY.md §5).
"""
