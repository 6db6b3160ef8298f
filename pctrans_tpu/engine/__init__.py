"""Training engine: solver, train state, trainer, inference driver."""
