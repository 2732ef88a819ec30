"""Runtime utilities: structured logging, phase timers, checkpoints, metrics."""
