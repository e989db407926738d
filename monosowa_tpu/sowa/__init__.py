"""The SOWA pseudo-label pipeline: TPU-batched auto-labelling of cars from
monocular video (the rebuild of pseudo_label_generator/3d)."""
