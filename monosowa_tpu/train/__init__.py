"""Training / evaluation loops: pjit data-parallel trainer, decode helpers,
checkpointing, tester."""
