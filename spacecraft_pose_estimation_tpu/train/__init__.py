"""Training stack: losses, optimizers/schedules, trainer loop, checkpointing."""
