"""Training: losses, schedules, optimizer and the solver loops.

Function-level entry points mirroring the reference's public API
(train_bus.py:1055-1088): ``train_net`` / ``train_net_alter`` — import from
``wssdl_bus_tpu.train.solver`` (kept lazy here: the solver pulls in jax)."""
