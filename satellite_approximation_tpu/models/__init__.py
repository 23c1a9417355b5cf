"""Algorithmic cores: masked Laplace/Poisson solvers and the detection
pipeline — the TPU-native counterpart of the reference's lib/approx and
lib/cloud_shadow_detection."""
