"""Flax model zoo: the depth-aware DETR monocular 3D detector
(MonoDETR-equivalent) and its components."""
