"""Command-line applications: demo, evaluation protocols, training."""
