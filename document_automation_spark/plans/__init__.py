"""Job-level planning: checkpoint manifests, resume, observation metrics."""
