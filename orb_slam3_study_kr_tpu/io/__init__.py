"""Dataset drivers, synthetic scene rendering, trajectory I/O (L9)."""
