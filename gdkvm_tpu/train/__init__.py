"""Training: losses, optimizer, sharded train loop."""
