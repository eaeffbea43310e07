"""Evaluation: Dice metrics, streaming inference, throughput measurement."""
