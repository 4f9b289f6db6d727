"""Training loop, state, and jitted step functions."""
