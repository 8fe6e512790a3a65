"""Training: losses, schedules, optimizer and the solver loops."""
