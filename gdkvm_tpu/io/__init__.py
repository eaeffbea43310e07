"""IO: Orbax checkpointing, offline metrics logging, visualization dumps."""
