"""Physical-plan inspection helpers used by tests and tuning."""
